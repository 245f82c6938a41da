package graft

import graft.plans.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Commit-log mechanics in isolation (T6/T8 storage layer): carried
 * tables resolve through the manifest to the round that last wrote them,
 * hybrid tables fold replace+append chains, empty appends are absent,
 * and late meta lands in the same atomic manifest. */
class SnapshotTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("carried replaced tables resolve across multi-round chains") {
    import spark.implicits._
    val snap = new SnapshotTable(Files.createTempDirectory("snap-carried").toString)
    val t0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    snap.commit(spark, 0, replaced = Map("t" -> t0), appended = Map.empty,
      meta = Map("m" -> "0"))
    // rounds 1..3 carry t unchanged; each manifest must flatten the chain
    (1 to 3).foreach { r =>
      snap.commit(spark, r, replaced = Map.empty, appended = Map.empty,
        meta = Map("m" -> r.toString), carried = Map("t" -> (r - 1)))
      assert(snap.tables(r)("t") == "data/t/r00000", s"round $r chain not flat")
    }
    val got = snap.loadReplaced(spark, "t", 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("b", 2L)))
    // round 4 rewrites; round 5 carries the NEW version
    snap.commit(spark, 4, replaced = Map("t" -> Seq(("c", 3L)).toDF("k", "v")),
      appended = Map.empty, meta = Map.empty)
    snap.commit(spark, 5, replaced = Map.empty, appended = Map.empty,
      meta = Map.empty, carried = Map("t" -> 4))
    assert(snap.loadReplaced(spark, "t", 5).collect()
      .map(_.getString(0)).toSeq == Seq("c"))
  }

  test("hybrid chain: replace base + deltas, skipped rounds contribute nothing") {
    import spark.implicits._
    val snap = new SnapshotTable(Files.createTempDirectory("snap-hybrid").toString)
    snap.commit(spark, 0, replaced = Map("h" -> Seq("r0").toDF("x")),
      appended = Map.empty, meta = Map.empty)
    snap.commit(spark, 1, replaced = Map.empty,
      appended = Map("h" -> Seq("r1").toDF("x")), meta = Map.empty)
    snap.commit(spark, 2, replaced = Map.empty, appended = Map.empty,
      meta = Map.empty) // round that never mentions h
    snap.commit(spark, 3, replaced = Map.empty,
      appended = Map("h" -> Seq("r3").toDF("x")), meta = Map.empty)
    assert(snap.loadHybrid(spark, "h", 3).collect().map(_.getString(0)).toSet ==
      Set("r0", "r1", "r3"))
    // a later replace compacts the chain
    snap.commit(spark, 4, replaced = Map("h" -> Seq("compacted").toDF("x")),
      appended = Map.empty, meta = Map.empty)
    assert(snap.loadHybrid(spark, "h", 4).collect().map(_.getString(0)).toSeq ==
      Seq("compacted"))
    // append table with no data anywhere fails with the explicit message
    val e = intercept[IllegalArgumentException](
      snap.loadAppended(spark, "nope", 4))
    assert(e.getMessage.contains("no data"))
  }

  test("crash between table writes and manifest rename: orphan dirs are invisible and overwritten") {
    import spark.implicits._
    val snap = new SnapshotTable(Files.createTempDirectory("snap-crash").toString)
    snap.commit(spark, 0, replaced = Map("rep" -> Seq(("a", 0L)).toDF("k", "v")),
      appended = Map("app" -> Seq("a0").toDF("x")), meta = Map("k" -> "r0"))
    snap.commit(spark, 1, replaced = Map("rep" -> Seq(("b", 1L)).toDF("k", "v")),
      appended = Map("app" -> Seq("a1").toDF("x")), meta = Map("k" -> "r1"))
    // simulate a crash INSIDE round 2's commit: the table data directories
    // were fully written, the process died before the manifest rename —
    // the commit point was never reached
    Seq(("ORPHAN", 99L)).toDF("k", "v")
      .write.parquet(s"${snap.root}/data/rep/r00002")
    Seq("ORPHAN").toDF("x").write.parquet(s"${snap.root}/data/app/r00002")
    // resume sees round 1 EXACTLY: the orphan round does not exist
    assert(snap.latestRound.contains(1))
    assert(snap.loadReplaced(spark, "rep", 1).collect()
      .map(_.getString(0)).toSeq == Seq("b"))
    assert(snap.loadAppended(spark, "app", 1).collect()
      .map(_.getString(0)).toSet == Set("a0", "a1"))
    assert(snap.meta(1)("k") == "r1")
    // the re-run of round 2 overwrites the orphan directories cleanly and
    // its commit becomes visible atomically
    snap.commit(spark, 2, replaced = Map("rep" -> Seq(("c", 2L)).toDF("k", "v")),
      appended = Map("app" -> Seq("a2").toDF("x")), meta = Map("k" -> "r2"))
    assert(snap.latestRound.contains(2))
    assert(snap.loadReplaced(spark, "rep", 2).collect()
      .map(_.getString(0)).toSeq == Seq("c"))
    assert(snap.loadAppended(spark, "app", 2).collect()
      .map(_.getString(0)).toSet == Set("a0", "a1", "a2"))
  }

  test("legitimately-empty append tables: hasAppends false, loadAppendedOr yields schema-correct empty") {
    import spark.implicits._
    val snap = new SnapshotTable(Files.createTempDirectory("snap-empty").toString)
    snap.commit(spark, 0, replaced = Map("t" -> Seq(1L).toDF("v")),
      appended = Map.empty, meta = Map.empty)
    // a table no round ever appended (e.g. postings of a crawl whose every
    // seed 404'd) is a legitimate empty state for read projections
    assert(!snap.hasAppends("postings", 0))
    val empty = snap.loadAppendedOr(spark, "postings", 0,
      "term string, url string, weight double, title string, round int")
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("term", "url", "weight", "title", "round"))
    // once data exists, loadAppendedOr delegates to the real read
    snap.commit(spark, 1, replaced = Map.empty,
      appended = Map("postings" -> Seq(("t", "u", 1.0, "ti", 1))
        .toDF("term", "url", "weight", "title", "round")), meta = Map.empty)
    assert(snap.hasAppends("postings", 1))
    assert(snap.loadAppendedOr(spark, "postings", 1, "x string").count() == 1)
  }

  test("metaLate lands in the committed manifest") {
    import spark.implicits._
    val snap = new SnapshotTable(Files.createTempDirectory("snap-meta").toString)
    var sideEffect = "not-run"
    snap.commit(spark, 0, replaced = Map("t" -> Seq(1L).toDF("v")),
      appended = Map.empty, meta = Map("early" -> "1"),
      metaLate = () => { sideEffect = "ran"; Map("late" -> "2") })
    assert(sideEffect == "ran")
    assert(snap.meta(0) == Map("early" -> "1", "late" -> "2"))
  }
}
