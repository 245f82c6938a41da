package graft

import graft.operators.Crawler
import graft.oracle.CrawlOracle
import graft.plans.SnapshotTable
import graft.sources.CorpusGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/**
 * The correctness gate (BASELINE.md §B): the distributed engine must
 * reproduce the sequential oracle's dispatch schedule, seen set, and
 * terminal states EXACTLY, on a corpus that exercises every policy path
 * (hot host, flaky/timeout docs, dangling links, non-HTML docs, a
 * robots-disallowed host, a slow host, per-domain caps, depth gate).
 */
class CrawlEngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val nDocs = 800L
  val cfg = CrawlConfig(
    maxDepth = 3, maxPagesPerDomain = 25, respectRobots = true,
    defaultCrawlDelayS = 1.0, maxRetries = 3, roundSeconds = 5.0)

  lazy val docsMap: Map[String, Doc] =
    (0L until nDocs).map(i => CorpusGen.docOf(i, nDocs))
      .map(d => d.doc_id -> d).toMap
  lazy val policies = CorpusGen.policies(nDocs, cfg.defaultCrawlDelayS, cfg.maxPagesPerDomain)
  lazy val policyMap = policies.map(p => p.host -> p).toMap
  lazy val seeds = CorpusGen.seeds(nDocs, 3)

  lazy val oracleResult = new CrawlOracle(docsMap, policyMap, cfg).run(seeds)

  def runEngine(root: String, maxRounds: Int = 10000): Crawler.CrawlSummary = {
    import spark.implicits._
    Crawler.run(spark, CorpusGen.docs(spark, nDocs),
      seeds, policies.toDS(), cfg, root, maxRounds)
  }

  def engineSchedule(root: String, lastRound: Int): Seq[(Int, String, String)] = {
    val snap = new SnapshotTable(root)
    snap.loadAppended(spark, "fetch_log", lastRound)
      .orderBy(col("round"), col("seq"))
      .select("round", "url", "status")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
  }

  def engineSeen(root: String, lastRound: Int): Set[String] = {
    val snap = new SnapshotTable(root)
    snap.loadHybrid(spark, "seen", lastRound)
      .collect().map(_.getString(0)).toSet
  }

  test("engine reproduces the oracle: schedule, seen set, terminal states, host counts") {
    val root = Files.createTempDirectory("graft-crawl").toString
    val summary = runEngine(root)
    val last = summary.rounds - 1

    assert(oracleResult.schedule.nonEmpty)
    // the oracle visited a meaningful slice of the corpus
    assert(oracleResult.seen.size > 50, s"seen=${oracleResult.seen.size}")

    val got = engineSchedule(root, last)
    val want = oracleResult.schedule.map(l => (l.round, l.url, l.status))
    assert(got.size == want.size,
      s"schedule length ${got.size} vs oracle ${want.size}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"schedule diverges at slot $i: engine=$g oracle=$w")
    }

    assert(engineSeen(root, last) == oracleResult.seen.toSet)

    val snap = new SnapshotTable(root)
    val byStatus = snap.loadAppended(spark, "fetch_log", last)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val oracleCompleted = oracleResult.completed.size
    assert(byStatus.getOrElse("ok", 0L) + byStatus.getOrElse("ok_non_html", 0L)
      == oracleCompleted)

    val engineCounts = snap.loadReplaced(spark, "host_counts", last)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(engineCounts == oracleResult.hostCounts)

    // policy invariants observable in the lineage
    val log = snap.loadAppended(spark, "fetch_log", last)
    val disallowedHosts = policies.filter(!_.allow).map(_.host).toSet
    val robotsRows = log.where(col("status") === "skipped_robots")
      .select("host").collect().map(_.getString(0)).toSet
    assert(robotsRows.subsetOf(disallowedHosts))
    // per-domain cap holds on enqueue counts
    engineCounts.values.foreach(c => assert(c <= cfg.maxPagesPerDomain))
    // counters table rides in the same atomic snapshots and matches the
    // driver-side stats exactly (status projections §3.3)
    val counterRows = Crawler.status(spark, root)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val wantCounters = summary.stats.map(s => (s.round, s.dispatched,
      s.completed, s.failed, s.requeued, s.admitted, s.frontierSize, s.seenSize))
    assert(counterRows.toSeq == wantCounters)
    assert(Crawler.recentActivity(spark, root).count() == 5)

    // politeness: per (host, round) dispatch count within budget
    val perRound = log.groupBy("host", "round").count().collect()
    perRound.foreach { r =>
      val host = r.getString(0); val n = r.getLong(2)
      val delay = policyMap.get(host).map(_.crawl_delay_s).getOrElse(cfg.defaultCrawlDelayS)
      // cumulative budget bound: can never exceed one round's full budget
      // plus backlog from deferred rounds — exact schedule equality above is
      // the strong check; here we bound a single round by the total allowance
      assert(n <= math.floor((r.getInt(1) + 1) * cfg.roundSeconds / delay).toLong)
    }
  }

  test("resume from a mid-crawl snapshot produces the identical final state") {
    val rootA = Files.createTempDirectory("graft-crawl-a").toString
    val rootB = Files.createTempDirectory("graft-crawl-b").toString
    val full = runEngine(rootA)
    // interrupted run: stop after 2 rounds, then resume to completion
    runEngine(rootB, maxRounds = 2)
    val resumed = runEngine(rootB)
    assert(resumed.rounds == full.rounds)
    assert(engineSchedule(rootB, resumed.rounds - 1) ==
      engineSchedule(rootA, full.rounds - 1))
    assert(engineSeen(rootB, resumed.rounds - 1) ==
      engineSeen(rootA, full.rounds - 1))
  }

  test("output is invariant to shuffle partitioning (salt-/parallelism-independence)") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val rootA = Files.createTempDirectory("graft-crawl-p3").toString
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val s3 = runEngine(rootA)
      assert(engineSchedule(rootA, s3.rounds - 1).map(t => (t._1, t._2)) ==
        oracleResult.schedule.map(l => (l.round, l.url)))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
