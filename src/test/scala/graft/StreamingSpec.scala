package graft

import graft.streaming.{FetchRequest, Streaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Structured-Streaming counterparts of the stateful ops (SURVEY §2.8). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("politenessSchedule enforces per-host min-interval across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FetchRequest]
    val out = Streaming.politenessSchedule(in.toDS(),
      Map("slow.test" -> 30000L), defaultDelayMillis = 1000L)
    val q = out.writeStream.format("memory").queryName("sched")
      .outputMode("append").start()
    try {
      in.addData(
        FetchRequest("u1", "a.test", ts(100)),
        FetchRequest("u2", "a.test", ts(100)),
        FetchRequest("u3", "a.test", ts(100)),
        FetchRequest("s1", "slow.test", ts(100)),
        FetchRequest("s2", "slow.test", ts(100)))
      q.processAllAvailable()
      in.addData(FetchRequest("u4", "a.test", ts(100)),
        FetchRequest("s3", "slow.test", ts(100)))
      q.processAllAvailable()

      val rows = spark.table("sched")
        .select("url", "host", "fetch_at").collect()
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2).getTime))
        .sortBy(_._3)
      val a = rows.filter(_._2 == "a.test").map(_._3)
      val s = rows.filter(_._2 == "slow.test").map(_._3)
      // per-host spacing ≥ delay, including across the batch boundary
      assert(a.toSeq == Seq(100000L, 101000L, 102000L, 103000L))
      assert(s.toSeq == Seq(100000L, 130000L, 160000L))
    } finally q.stop()
  }

  test("seenDedup keeps first sight of each URL across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = Streaming.seenDedup(in.toDS().toDF("url", "ts"), "url", "ts")
    val q = out.writeStream.format("memory").queryName("seen")
      .outputMode("append").start()
    try {
      in.addData(("u1", ts(10)), ("u2", ts(11)), ("u1", ts(12)))
      q.processAllAvailable()
      in.addData(("u2", ts(13)), ("u3", ts(14)), ("u1", ts(15)))
      q.processAllAvailable()
      val got = spark.table("seen").select("url", "ts").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000)).sorted
      assert(got.toSeq == Seq(("u1", 10L), ("u2", 11L), ("u3", 14L)))
    } finally q.stop()
  }

  test("seenDedup equals the batch first-sight dedup on the same feed (within watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic feed: 300 events over 120 distinct urls, event time
    // strictly increasing (arrival order == event-time order, everything
    // inside the 1h watermark horizon) — the regime where the incremental
    // operator must agree EXACTLY with the batch engine's
    // first-occurrence-wins dedup (D1/D2's min-over-order aggregation,
    // with event time as the order)
    val feed = (0 until 300).map(i => (s"u${(i * 7919) % 120}", ts(1000 + i)))
    val in = MemoryStream[(String, Timestamp)]
    val out = Streaming.seenDedup(in.toDS().toDF("url", "ts"), "url", "ts")
    val q = out.writeStream.format("memory").queryName("seen_parity")
      .outputMode("append").start()
    try {
      // several micro-batches, so first sights and duplicates cross
      // batch boundaries both ways
      feed.grouped(100).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val got = spark.table("seen_parity").select("url", "ts").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime)).sorted.toSeq
      val want = feed.toDF("url", "ts")
        .groupBy("url").agg(min("ts").as("ts"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime)).sorted.toSeq
      assert(want.size == 120 && got == want)
    } finally q.stop()
  }

  test("windowedCounts matches the batch tumbling-window aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (ts(10), "view", 1.25), (ts(20), "click", 0.5),
      (ts(3700), "view", 2.0), (ts(3800), "view", 0.125),
      (ts(7300), "error", 9.0))
    val in = MemoryStream[(Timestamp, String, Double)]
    val stream = Streaming.windowedCounts(
      in.toDS().toDF("ts", "event_type", "value"))
    val q = stream.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      in.addData(events)
      q.processAllAvailable()
      val got = spark.table("wc")
        .orderBy("win_start", "event_type")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
          r.getLong(2), r.getLong(3))).toSeq
      val want = events.toDF("ts", "event_type", "value")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("vm"))
        .orderBy("h", "event_type")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
          r.getLong(2), r.getLong(3))).toSeq
      assert(got == want)
    } finally q.stop()
  }
}
