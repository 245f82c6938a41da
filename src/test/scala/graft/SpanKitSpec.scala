package graft

import graft.functions.SpanKit
import graft.sources.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

class SpanKitSpec extends AnyFunSuite {

  test("hand-written document parses to expected ordered spans") {
    val raw =
      """<html><head><title>  My   Title </title><script>var a = "<a href='x'>no</a>";</script></head>
        |<body><p> hello  world </p>
        |<a class="l" href="/q/1">first link</a>
        |middle text
        |<img src="https://a.test/i.png"/>
        |<a href='rel/2'>second</a><style>p { color: red }</style>
        |tail</body></html>""".stripMargin
    val got = SpanKit.extract(raw).toSeq
    val want = Seq(
      Span("title", "My Title", "", 0),
      Span("text", "hello world", "", 1),
      Span("link", "first link", "/q/1", 2),
      Span("text", "middle text", "", 3),
      Span("media", "", "https://a.test/i.png", 4),
      Span("link", "second", "rel/2", 5),
      Span("text", "tail", "", 6))
    assert(got == want)
  }

  test("anchor without href is text; script/style content never leaks") {
    val got = SpanKit.extract("<a>plain</a><script>leak1</script><style>leak2</style>x").toSeq
    assert(got == Seq(Span("text", "plain", "", 0), Span("text", "x", "", 1)))
  }

  test("empty and tag-only documents") {
    assert(SpanKit.extract("").isEmpty)
    assert(SpanKit.extract("<html><body></body></html>").isEmpty)
    assert(SpanKit.extract(null).isEmpty)
  }

  test("per-row invariant: extract(render(spans)) == spans across the corpus") {
    val n = 2000L
    (0L until n).foreach { i =>
      val doc = CorpusGen.docOf(i, n)
      if (doc.content_type == "text/html") {
        val got = SpanKit.extract(doc.raw).toSeq
        assert(got == doc.spans, s"doc $i (${doc.doc_id})\nraw=${doc.raw}")
      }
    }
  }

  test("corpus shape: hot host holds ~50% of pages; ~5% non-html") {
    val n = 4000L
    val hosts = (0L until n).map(i => CorpusGen.hostOf(i, n))
    val hot = hosts.count(_ == 0).toDouble / n
    assert(hot > 0.45 && hot < 0.55, s"hot-host share $hot")
    val nonHtml = (0L until n).count(i => !CorpusGen.isHtml(i)).toDouble / n
    assert(nonHtml > 0.02 && nonHtml < 0.08, s"non-html share $nonHtml")
  }
}
