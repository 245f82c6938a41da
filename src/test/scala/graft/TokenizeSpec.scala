package graft

import graft.functions.{gf, UrlKit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r6 optimization equivalence locks: the native tokenizer must be
 * byte-equal to the composed `filter(split(lower(text), "[^a-z0-9_]+"))`
 * form it replaced, and the UrlKit fast paths must not change a single
 * output. */
class TokenizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def composed(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z0-9_]+"), t => t =!= lit(""))

  private val adversarial = Seq(
    "Hello, World! foo_bar BAZ42",
    "", "   ", "!!!", "_", "a", "über Ärger STRASSE",
    "tab\tsep\nnewline\rcr", "1+2=3; x%y", "ONE", "one two  three",
    "KELVIN and İstanbul", // K (Kelvin) lowers to 'k'; İ to i+combining dot
    "ſharp long s", "中文 mixed ascii123", "trailing sep...", "...leading",
    "a_b_c__d", "0123456789", "MiXeD CaSe ToKeNs")

  test("native tokenize equals the composed lower+split+filter form") {
    import spark.implicits._
    val df = adversarial.toDF("text")
    val diff = df.select(gf.tokenize(col("text")).as("fast"),
        composed(col("text")).as("slow"))
      .where(!(col("fast") <=> col("slow")))
      .count()
    assert(diff == 0L)
  }

  test("native tokenize equals the composed form on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val diff = docs.select(gf.tokenize(col("text")).as("fast"),
        composed(col("text")).as("slow"))
      .where(!(col("fast") <=> col("slow")))
      .count()
    assert(diff == 0L)
  }

  test("tokenize_prefix(n) is exactly slice(tokenize, 1, n)") {
    import spark.implicits._
    val df = adversarial.toDF("text")
    Seq(1, 5).foreach { n =>
      val diff = df.select(gf.tokenize_prefix(col("text"), n).as("fast"),
          slice(composed(col("text")), 1, n).as("slow"))
        .where(!(col("fast") <=> col("slow")))
        .count()
      assert(diff == 0L, s"prefix $n diverged")
    }
  }

  test("tokenize null-safety and empty-limit edge") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val rows = df.select(gf.tokenize(col("text"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[String](0) == Seq("a", "b"))
  }

  test("removeDotSegments fast path: dot-free identities and dot vectors unchanged") {
    // dot-free inputs must be identities (the fast path's claim)…
    Seq("/p/123", "/", "", "abc", "a//b", "/a/b/", "///", "////", "/a..b/c",
      "a.b/c.d", "/.well-known-x/hidden.file").foreach { p =>
      // …except "//" which the general algorithm maps to "/" (guarded)
      assert(UrlKit.removeDotSegments(p) == p, s"identity broken for '$p'")
    }
    assert(UrlKit.removeDotSegments("//") == "/")
    // dot-segment vectors (general algorithm results, pinned pre-r6)
    assert(UrlKit.removeDotSegments("/a/./b") == "/a/b")
    assert(UrlKit.removeDotSegments("/a/../b") == "/b")
    assert(UrlKit.removeDotSegments("/a/b/..") == "/a/")
    assert(UrlKit.removeDotSegments("/a/b/.") == "/a/b/")
    assert(UrlKit.removeDotSegments("../a") == "../a")
    assert(UrlKit.removeDotSegments("./a") == "a")
    assert(UrlKit.removeDotSegments("/..") == "/")
    assert(UrlKit.removeDotSegments("/.") == "/")
  }

  test("hasScheme hand-rolled scan matches the anchored-regex semantics") {
    val re = "^[A-Za-z][A-Za-z0-9+.-]*:".r
    Seq("http://x", "https:", "ftp+x.y-z:1", "a:", ":x", "1http:", "", "//x",
      "mailto:x@y", "ht tp:", "h\ttp:", "x", "x:", "x;y:", "Xy-Z+9.q:rest")
      .foreach { s =>
        assert(UrlKit.hasScheme(s) == re.findFirstIn(s).isDefined, s"'$s'")
      }
  }
}
