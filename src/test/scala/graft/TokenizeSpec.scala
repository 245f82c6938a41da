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

  test("log_ts byte scan equals the two-regex extraction exactly") {
    import spark.implicits._
    import graft.operators.LogParse
    val lines = Seq(
      "2024-01-15 10:30:45,123 - Master - INFO - evt 1",
      "[2024-01-15 10:30:45] crawler msg 2",
      "no timestamp line 3",
      "x 2024-01-15\t \t10:30:45 tail", // \s+ run inside the main pattern
      "[9999-99-99 99:99:99] digit-shaped non-date",
      "[12-3 4:5] short runs", "[1[2-3 4:5] nested bracket",
      "[1-2 x 3:4] broken alt then 2024-02-03 04:05:06",
      "2024-1-15 10:30:45 too-short field [2024-01-15 10:30:45]",
      "pre [only-dashes ::] post", "[] [ ] [1] [1 ] [ 1] [1 2]",
      "ends with date 2024-01-15 10:30:4") // truncated seconds
    val main = regexp_extract(col("line"), LogParse.TsRe, 1)
    val alt = regexp_extract(col("line"), LogParse.AltRe, 1)
    val slow = when(length(main) > 0, main).when(length(alt) > 0, alt)
    val diff = lines.toDF("line")
      .select(gf.log_ts(col("line")).as("fast"), slow.as("slow"))
      .where(!(col("fast") <=> col("slow")))
      .count()
    assert(diff == 0L)
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
