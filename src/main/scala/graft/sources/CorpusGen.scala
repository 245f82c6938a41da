package graft.sources

import graft.{Doc, HostPolicy, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic synthetic corpus (FIXTURES.md §1): the "web" the engine
 * crawls. Everything derives from splitmix64 over (SEED, doc index) — no
 * wall clock, no Random state — so any slice of any scale tier is
 * reproducible on any partitioning.
 *
 * Shape mirrors the reference's observed crawl field
 * (/root/reference/data/state/current_state.json): one hot host holds
 * ~50% of pages (www.bbc.com held 421/738), links are polluted with
 * javascript:/mailto:/#fragment hrefs (hygiene gcloud_crawler.py:303-313),
 * ~5% of docs are non-HTML (content-type gate :333-344), ~5% of link
 * targets dangle (fetch failures), and a small set of docs are "flaky"
 * (first k fetch attempts time out — retry ladder gcloud_master.py:497-531).
 */
object CorpusGen {

  val SEED = 0x5EED5EEDL

  // splitmix64
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  def mix(a: Long, b: Long): Long = mix(mix(a) ^ b)
  @inline private def pos(x: Long): Long = x & Long.MaxValue

  val Words: Array[String] = Array(
    "spark", "query", "data", "table", "row", "column", "filter", "join",
    "scan", "agg", "sort", "hash", "merge", "batch", "stream", "window",
    "index", "crawl", "frontier", "fetch", "link", "page", "host", "depth",
    "seed", "bloom", "cuckoo", "shard", "round", "state", "queue", "retry")

  def hostCount(nDocs: Long): Int = math.max(4, math.min(64, (nDocs / 64).toInt))

  def hostOf(i: Long, nDocs: Long): Int = {
    val h = hostCount(nDocs)
    val r = pos(mix(SEED, i * 7 + 1))
    if (r % 2 == 0) 0 else 1 + (pos(mix(r)) % (h - 1)).toInt
  }

  def hostName(hostIdx: Int): String = f"h-$hostIdx%03d.example.test"

  def urlOf(i: Long, nDocs: Long): String =
    s"https://${hostName(hostOf(i, nDocs))}/p/${"%06d".format(i)}"

  def isHtml(i: Long): Boolean = pos(mix(SEED, i * 13 + 2)) % 20 != 0

  /** First k fetch attempts of this doc time out (0 = never flaky). */
  def flakyFails(i: Long): Int = {
    val r = pos(mix(SEED, i * 17 + 3))
    if (r % 25 == 0) 1 + (pos(mix(r)) % 3).toInt else 0
  }

  private def word(r: Long): String = Words((pos(r) % Words.length).toInt)

  private def sentence(i: Long, s: Long, len: Int): String =
    (0 until len).map(k => word(mix(SEED, i * 1009 + s * 131 + k))).mkString(" ")

  /** The ordered golden spans of doc i — generated first; the raw document
   * is rendered FROM these, and SpanKit.extract(raw) must reproduce them
   * exactly (the per-row invariant). */
  def spansOf(i: Long, nDocs: Long): Seq[Span] = {
    if (!isHtml(i)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Span]
    def add(kind: String, text: String, ref: String): Unit =
      out += Span(kind, text, ref, out.length)
    add("title", s"doc ${"%06d".format(i)} ${sentence(i, 0, 3)}", "")
    val selfUrl = urlOf(i, nDocs)
    val selfHost = hostOf(i, nDocs)
    val nLinks = (pos(mix(SEED, i * 29 + 4)) % 7).toInt // 0..6 outlinks
    val nText = 1 + (pos(mix(SEED, i * 31 + 5)) % 3).toInt
    var li = 0
    var ti = 0
    var slot = 0
    val total = nLinks + nText
    while (slot < total) {
      val emitLink = li < nLinks && (ti >= nText || pos(mix(SEED, i * 37 + slot + 6)) % 2 == 0)
      if (emitLink) {
        val r = mix(SEED, i * 41 + li * 101 + 7)
        val target = pos(r) % (nDocs * 21 / 20) // ~5% dangle past nDocs
        val targetUrl = urlOf(target, nDocs)
        val sameHost = hostOf(target, nDocs) == selfHost
        val form = pos(mix(r, 11)) % 8
        val href = form match {
          case 0 | 1 | 2 => targetUrl                               // absolute
          case 3 => targetUrl + "#sec" + (pos(r) % 4)                // absolute + fragment
          case 4 => "//" + hostName(hostOf(target, nDocs)) +
                    "/p/" + "%06d".format(target)                    // scheme-relative
          case 5 if sameHost => "/p/" + "%06d".format(target)        // root-relative
          case 6 if sameHost => "../p/" + "%06d".format(target)      // dot-relative
          case _ => targetUrl
        }
        add("link", s"to ${word(mix(r, 13))} ${"%06d".format(target)}", href)
        // pollution: some docs also carry junk hrefs the hygiene filter drops
        val junk = pos(mix(r, 17)) % 10
        if (junk == 0) add("link", "noop", "javascript:void(0)")
        else if (junk == 1) add("link", "mail", "mailto:x@example.test")
        else if (junk == 2) add("link", "top", "#top")
        li += 1
      } else {
        add("text", sentence(i, 20 + ti, 5 + (pos(mix(SEED, i * 43 + ti + 8)) % 8).toInt), "")
        ti += 1
      }
      slot += 1
    }
    if (pos(mix(SEED, i * 47 + 9)) % 3 == 0)
      add("media", "", s"$selfUrl/img${pos(mix(SEED, i * 53 + 10)) % 5}.png")
    out.toSeq
  }

  /** Render golden spans to the raw interleaved document. Transparent tags
   * (<p>, <br>) separate consecutive text spans so the parse is exact. */
  def render(i: Long, spans: Seq[Span]): String = {
    if (spans.isEmpty) return s"%PDF-1.4 synthetic-binary-doc-$i"
    val sb = new StringBuilder
    sb ++= "<html><head>"
    spans.foreach { s =>
      s.kind match {
        case "title" =>
          sb ++= s"<title>${s.text}</title>"
          sb ++= "<script>var x = 1; // <a href=\"javascript:ignored\">not a link</a>\n</script></head><body>\n"
        case "text" => sb ++= s"<p>  ${s.text}\t</p>\n"
        case "link" => sb ++= s"""<a class="l" href="${s.media_ref}">${s.text}</a>\n"""
        case "media" => sb ++= s"""<img src="${s.media_ref}"/>\n"""
      }
    }
    sb ++= "</body></html>"
    sb.toString
  }

  def docOf(i: Long, nDocs: Long): Doc = {
    val spans = spansOf(i, nDocs)
    Doc(
      doc_id = urlOf(i, nDocs),
      raw = render(i, spans),
      content_type = if (isHtml(i)) "text/html" else "application/pdf",
      flaky_fails = flakyFails(i),
      spans = spans)
  }

  /** Distributed corpus: pure function of the row index — partitioning-
   * independent, no shuffle, scales linearly with executors. */
  def docs(spark: SparkSession, nDocs: Long): Dataset[Doc] = {
    import spark.implicits._
    spark.range(nDocs).map(i => docOf(i, nDocs))
  }

  /** Per-host robots/politeness policy (FIXTURES.md §3): one disallowed
   * host, one slow host, the rest defaults. */
  def policies(nDocs: Long, defaultDelayS: Double, maxPages: Int): Seq[HostPolicy] = {
    val h = hostCount(nDocs)
    (0 until h).map { k =>
      val allow = k % 17 != 3
      val delay = if (k % 11 == 5) 30.0 else defaultDelayS
      HostPolicy(hostName(k), allow, delay, maxPages)
    }
  }

  def seeds(nDocs: Long, nSeeds: Int = 3): Seq[String] =
    (0L until math.min(nSeeds.toLong, nDocs)).map(i => urlOf(i, nDocs))
}
