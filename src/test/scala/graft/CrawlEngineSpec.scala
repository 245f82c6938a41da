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

  def runEngine(root: String, maxRounds: Int = 10000,
                cfgUsed: CrawlConfig = cfg,
                seedFeed: Int => Seq[String] = _ => Nil): Crawler.CrawlSummary = {
    import spark.implicits._
    Crawler.run(spark, CorpusGen.docs(spark, nDocs),
      seeds, policies.toDS(), cfgUsed, root, maxRounds, seedFeed = seedFeed)
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

  test("resume from a LEGACY pre-LSM snapshot (relative ranks, no host_enq) completes to the oracle schedule") {
    import org.apache.spark.sql.expressions.Window
    // backlog-heavy config (wide cap, deeper depth): the frontier outgrows
    // the politeness budget, so dead rows stay BELOW live size for many
    // rounds and no natural compaction masks a rank-semantics mix — the
    // post-conversion normalization has to be forced, and oracle equality
    // detects it if it isn't
    // snapshot at round 3, where the frontier (~90 live rows) holds
    // multi-round politeness backlogs on hosts that already HAVE dispatch
    // history — the rows a rank-semantics mix silently loses are then rows
    // the oracle dispatches within the horizon, so schedule equality bites
    // (at an earlier cut the only deferred rows sit on the slowest host,
    // which the oracle can't reach within maxRounds either, masking a mix)
    val cfgL = cfg.copy(maxPagesPerDomain = 100, maxDepth = 5)
    val oracleL = new CrawlOracle(docsMap, policyMap, cfgL).run(seeds, maxRounds = 60)
    val root = Files.createTempDirectory("graft-crawl-legacy").toString
    runEngine(root, maxRounds = 4, cfgUsed = cfgL)
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.get
    // Rewrite round r IN PLACE into the r4 on-disk dialect: ONE
    // replace-format frontier holding LIVE rows with RELATIVE per-host
    // ranks (1..k over the live set in seq order), hybrid seen/failed
    // compacted to replaces (both legal legacy forms), no host_enq table,
    // no frontierAbsRank/frontierSize/seenSize meta stamps. Overwriting
    // the same round (rather than committing r+1) keeps round NUMBERING
    // identical to the uninterrupted run — politeness budgets are a
    // function of the round index, so exact schedule equality stays the
    // assertion. Materialize eagerly FIRST: the commit overwrites the very
    // directories these frames read.
    val sched = snap.loadReplaced(spark, "host_sched", r)
    val live = snap.loadHybrid(spark, "frontier", r)
      .join(sched, Seq("host"), "left_outer")
      .where(col("host_rank") > coalesce(col("dispatched"), lit(0L)))
      .drop("dispatched")
      .withColumn("host_rank", row_number()
        .over(Window.partitionBy(col("host")).orderBy(col("seq"))).cast("long"))
      .localCheckpoint(true)
    val seenLegacy = snap.loadHybrid(spark, "seen", r).localCheckpoint(true)
    val failedLegacy = snap.loadHybrid(spark, "failed", r).localCheckpoint(true)
    val nextSeq = snap.meta(r)("nextSeq")
    val blob = snap.loadBlob("seen_sketch", r).get
    snap.commit(spark, r,
      replaced = Map("frontier" -> live, "seen" -> seenLegacy,
        "failed" -> failedLegacy),
      appended = Map.empty,
      meta = Map("nextSeq" -> nextSeq),
      blobs = Map("seen_sketch" -> blob),
      bucketed = Map("frontier" ->
        pmod(xxhash64(col("host")), lit(SnapshotTable.Buckets))),
      carried = Map("host_counts" -> r, "host_sched" -> r, "quarantined" -> r))
    assert(!snap.meta(r).contains("frontierAbsRank"), "fixture must be legacy-format")
    // resume converts ranks once; the FIRST post-conversion commit must
    // compact (write the converted absolute-rank live rows as the new
    // base) — appending absolute-rank tiers over the relative-rank legacy
    // base would mix the two rank semantics on the next reload and
    // silently drop frontier rows. Oracle equality catches exactly that.
    val resumed = runEngine(root, maxRounds = 60, cfgUsed = cfgL)
    assert(engineSchedule(root, resumed.rounds - 1) ==
      oracleL.schedule.map(l => (l.round, l.url, l.status)))
    assert(engineSeen(root, resumed.rounds - 1) == oracleL.seen.toSet)
    assert(new SnapshotTable(root).meta(resumed.rounds - 1)("frontierAbsRank") == "1")
  }

  test("graceful stop at a round boundary: state == maxRounds cut, resume == uninterrupted") {
    import spark.implicits._
    // cooperative stop flag flips once two rounds have committed — the
    // reference's POST /stop_crawl lifecycle (stop → status shows running
    // work remains → later start resumes exactly)
    val root = Files.createTempDirectory("graft-crawl-stop").toString
    val snap = new SnapshotTable(root)
    val stopped = Crawler.run(spark, CorpusGen.docs(spark, nDocs), seeds,
      policies.toDS(), cfg, root,
      stopRequested = () => snap.latestRound.exists(_ >= 1))
    assert(stopped.rounds == 2, s"stop flag honored at the round-2 boundary")
    // stopped state is EXACTLY the maxRounds=2 state
    val rootM = Files.createTempDirectory("graft-crawl-stopm").toString
    runEngine(rootM, maxRounds = 2)
    assert(engineSchedule(root, 1) == engineSchedule(rootM, 1))
    assert(engineSeen(root, 1) == engineSeen(rootM, 1))
    // a stopped-but-unfinished crawl still reports running (work remains)
    assert(Crawler.statusSummary(spark, root).collect()(0)
      .getAs[Boolean]("is_running"))
    // resume (no stop flag) completes to the exact uninterrupted schedule
    val resumed = runEngine(root)
    assert(engineSchedule(root, resumed.rounds - 1) ==
      oracleResult.schedule.map(l => (l.round, l.url, l.status)))
    assert(engineSeen(root, resumed.rounds - 1) == oracleResult.seen.toSet)
  }

  test("problematic-host quarantine stays oracle-exact (F9)") {
    // maxRetries=0 makes every flaky doc exhaust on FIRST dispatch (early,
    // while its host still has queued URLs), and the wider cap/depth reach
    // enough docs that quarantined hosts keep receiving dispatches which
    // must short-circuit (69 quarantined rows in the oracle schedule)
    val cfgQ = cfg.copy(maxRetries = 0, maxPagesPerDomain = 100, maxDepth = 5)
    val oq = new CrawlOracle(docsMap, policyMap, cfgQ).run(seeds, maxRounds = 60)
    assert(oq.schedule.exists(_.status == "quarantined"),
      "fixture must actually exercise the quarantine path")
    val root = Files.createTempDirectory("graft-crawl-q").toString
    val s = runEngine(root, maxRounds = 60, cfgUsed = cfgQ)
    assert(engineSchedule(root, s.rounds - 1) ==
      oq.schedule.map(l => (l.round, l.url, l.status)))
    assert(engineSeen(root, s.rounds - 1) == oq.seen.toSet)
    // reset-failures clears the quarantine table
    Crawler.resetFailures(spark, root, cfgQ)
    val snap = new SnapshotTable(root)
    assert(snap.loadReplaced(spark, "quarantined", s.rounds).count() == 0)
  }

  test("mid-crawl seed injection stays oracle-exact (T5 config hot-reload)") {
    // big per-host cap so the injected URLs can't be cap-blocked — the
    // injection path itself (admission + back-of-queue seq) is under test
    val cfgH = cfg.copy(maxPagesPerDomain = 200)
    val feed: Int => Seq[String] = {
      case 2 => Seq(CorpusGen.urlOf(50, nDocs), CorpusGen.urlOf(51, nDocs),
        seeds.head) // one duplicate — must be seen-deduped (D3)
      case 4 => Seq(CorpusGen.urlOf(700, nDocs))
      case _ => Nil
    }
    val of = new CrawlOracle(docsMap, policyMap, cfgH).run(seeds, seedFeed = feed)
    assert(of.seen.contains(CorpusGen.urlOf(700, nDocs)),
      "injected seed must enter the crawl")
    val root = Files.createTempDirectory("graft-crawl-hot").toString
    val s = runEngine(root, cfgUsed = cfgH, seedFeed = feed)
    assert(engineSchedule(root, s.rounds - 1) ==
      of.schedule.map(l => (l.round, l.url, l.status)))
    assert(engineSeen(root, s.rounds - 1) == of.seen.toSet)
  }

  test("non-empty allowed_domains restricts admission oracle-exactly (F5)") {
    import graft.functions.UrlKit
    // restrictive EXACT list: the seed hosts only, with mixed case, stray
    // whitespace, and a blank entry (all gcloud_master.py:50-59 branches)
    val seedHosts = seeds.map(UrlKit.policyHost).distinct
    val cfgA = cfg.copy(allowedDomains =
      Seq(" " + seedHosts.head.toUpperCase + " ", "") ++ seedHosts.tail)
    val oa = new CrawlOracle(docsMap, policyMap, cfgA).run(seeds)
    assert(oa.seen.nonEmpty && oa.seen.size < oracleResult.seen.size,
      "fixture must actually restrict admission")
    // every admitted URL is on an allowed host (case-insensitive exact)
    val allowedSet = seedHosts.map(_.toLowerCase).toSet
    assert(oa.seen.forall(u => allowedSet.contains(UrlKit.policyHost(u))))
    val root = Files.createTempDirectory("graft-crawl-dom").toString
    val s = runEngine(root, cfgUsed = cfgA)
    assert(engineSchedule(root, s.rounds - 1) ==
      oa.schedule.map(l => (l.round, l.url, l.status)))
    assert(engineSeen(root, s.rounds - 1) == oa.seen.toSet)

    // dot-suffix + case branch: "Example.Test" admits every corpus host by
    // suffix, so the schedule must equal the unrestricted run's
    val cfgS = cfg.copy(allowedDomains = Seq("Example.Test"))
    val rootS = Files.createTempDirectory("graft-crawl-sfx").toString
    val sS = runEngine(rootS, cfgUsed = cfgS)
    assert(engineSchedule(rootS, sS.rounds - 1) ==
      oracleResult.schedule.map(l => (l.round, l.url, l.status)))
  }

  test("page store, persisted postings, search-from-store, worker stats (S6/J6/T8/A4)") {
    import graft.operators.SearchIndex
    val root = Files.createTempDirectory("graft-crawl-store").toString
    val summary = runEngine(root)
    val last = summary.rounds - 1
    val snap = new SnapshotTable(root)
    val log = snap.loadAppended(spark, "fetch_log", last)

    // S6: every completed fetch has its raw page stored
    val nCompleted = log.where(col("status").isin("ok", "ok_non_html")).count()
    assert(snap.loadAppended(spark, "pages", last).count() == nCompleted)

    // J6: point lookup returns the exact raw bytes of the corpus doc
    val u = seeds.head
    val got = Crawler.getPage(spark, root, u).collect()
    assert(got.length == 1 && got(0).getAs[String]("raw") == docsMap(u).raw)
    val chk = Crawler.checkUrl(spark, root, u).collect()
    assert(chk.exists(_.getAs[String]("match_kind") == "exact"))

    // T8: persisted per-round postings == postings recomputed from doc_store
    val docStore = snap.loadAppended(spark, "doc_store", last)
    val want = SearchIndex.postings(docStore.select("url", "title", "text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val gotP = snap.loadAppended(spark, "postings", last)
      .select("term", "url", "weight")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(gotP == want)

    // search over the persisted table == search over a recomputed index,
    // plus a snippet column (C8)
    val viaStore = Crawler.searchStore(spark, root, "spark crawl", "content", 10).collect()
    val direct = SearchIndex.search(
      SearchIndex.postings(docStore.select("url", "title", "text")),
      "spark crawl", "content", 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaStore.map(r => (r.getString(0), r.getDouble(1))).toSeq == direct)
    assert(viaStore.nonEmpty && viaStore.forall(_.getAs[String]("snippet").endsWith("...")))

    // J2 value checks: title-field and url-field search paths
    assert(Crawler.searchStore(spark, root, "crawl", "title", 5).count() <= 5)
    assert(Crawler.searchStore(spark, root, "h-000", "url", 5).count() == 5)

    // A4/T7: worker stats cover every processed row; heartbeat = max round
    val ws = Crawler.workerStats(spark, root)
    assert(ws.agg(sum("processed")).collect()(0).getLong(0) == log.count())

    // A4 remainder: exact index stats match countDistinct over the
    // persisted postings; per-round manifest deltas exist and their
    // posting counts (exact) sum to the table size
    val idx = Crawler.indexStats(spark, root).collect()(0)
    val postingsAll = snap.loadAppended(spark, "postings", last)
    assert(idx.getAs[Long]("distinct_terms") ==
      postingsAll.select("term").distinct().count())
    assert(idx.getAs[Long]("indexed_docs") ==
      postingsAll.select("url").distinct().count())
    assert(idx.getAs[Long]("postings_rows") == postingsAll.count())
    val hist = Crawler.indexStatsHistory(spark, root)
    assert(hist.count() > 0)
    assert(hist.agg(sum("new_postings")).collect()(0).getLong(0) ==
      postingsAll.count())

    // richer /status projection: finished crawl → not running; in_progress
    // structurally empty; recently_added = top-seq frontier tail (empty
    // here — the crawl drained its frontier)
    val st = Crawler.statusSummary(spark, root).collect()(0)
    assert(!st.getAs[Boolean]("is_running"))
    assert(st.getAs[Long]("seen_size") == engineSeen(root, last).size)
    assert(Crawler.inProgress(spark, root).count() == 0)
    assert(Crawler.recentlyAdded(spark, root).count() == 0)
    // a crawl stopped mid-flight reports running + a non-empty tail in
    // admission order
    val rootMid = Files.createTempDirectory("graft-crawl-mid").toString
    runEngine(rootMid, maxRounds = 2)
    val stMid = Crawler.statusSummary(spark, rootMid).collect()(0)
    assert(stMid.getAs[Boolean]("is_running"))
    val tail = Crawler.recentlyAdded(spark, rootMid, 3).collect()
    assert(tail.length == 3)
    assert(tail.map(_.getAs[Long]("seq")).toSeq == tail.map(_.getAs[Long]("seq")).sorted(Ordering[Long].reverse).toSeq)

    // S11: async request/response tables — submit two requests, process,
    // responses match the direct searchStore call; re-processing is a no-op
    val svc = new graft.operators.SearchService(root)
    svc.submit(spark, "r1", "spark crawl", "content", 10)
    svc.submit(spark, "r2", "frontier", "content", 5)
    assert(svc.pending(spark).count() == 2)
    assert(svc.processPending(spark, root) == 2)
    assert(svc.pending(spark).count() == 0)
    assert(svc.processPending(spark, root) == 0) // idempotent micro-batch
    val r1 = svc.responses(spark).where(col("req_id") === "r1")
      .orderBy("rank").collect().map(r => (r.getAs[String]("url"), r.getAs[Double]("score")))
    assert(r1.toSeq == viaStore.map(r => (r.getString(0), r.getDouble(1))).toSeq)

    // S11 at backlog scale: a bulk replay of requests across ALL THREE
    // search fields resolves in one processPending pass (one join-driven
    // plan per field, not one plan per request), and every response
    // equals the direct per-request searchStore result
    val bulk = Seq(
      ("b01", "spark crawl", "content", 10), ("b02", "frontier", "content", 3),
      ("b03", "crawl", "title", 5), ("b04", "spark", "title", 4),
      ("b05", "h-000", "url", 5), ("b06", "d/4", "url", 7),
      ("b07", "crawl frontier spark", "content", 8), ("b08", "spark spark", "content", 5))
    bulk.foreach { case (id, q, f, k) => svc.submit(spark, id, q, f, k) }
    assert(svc.processPending(spark, root) == bulk.length)
    assert(svc.pending(spark).count() == 0)
    val resp = svc.responses(spark)
    bulk.foreach { case (id, q, f, k) =>
      val got = resp.where(col("req_id") === id).orderBy("rank")
        .collect().map(r => (r.getAs[String]("url"), r.getAs[Double]("score"),
          r.getAs[String]("snippet"))).toSeq
      val want = Crawler.searchStore(spark, root, q, f, k)
        .collect().map(r => (r.getAs[String]("url"), r.getAs[Double]("score"),
          r.getAs[String]("snippet"))).toSeq
      assert(got == want, s"bulk response $id ($f '$q') diverges from searchStore")
    }
  }

  test("size-gate degradation through run(): fetch join AND dispatch budget past the broadcast limit") {
    // broadcastRowLimit = 0 forces every round of the FULL engine loop onto
    // both at-scale fallbacks at once: the fetch join degrades to bloom
    // scan-prune + shuffle-hash, and the dispatch budget join degrades from
    // broadcast to the hinted shuffle-hash path (budgetRowBound is always
    // > 0 once a policy row exists, so the gate trips in every round).
    // The schedule must be IDENTICAL to the broadcast plan's (same oracle).
    val root = Files.createTempDirectory("graft-crawl-shj").toString
    val s = runEngine(root, cfgUsed = cfg.copy(broadcastRowLimit = 0))
    assert(engineSchedule(root, s.rounds - 1) ==
      oracleResult.schedule.map(l => (l.round, l.url, l.status)))
    assert(engineSeen(root, s.rounds - 1) == oracleResult.seen.toSet)
  }

  test("dispatchSelect: sort-free rank-arithmetic path == windowed fallback, both join variants") {
    import spark.implicits._
    // frontier honoring the host_rank invariant (per-host consecutive 1..k
    // in seq order); budget exercises: capped host, zero budget, NEGATIVE
    // remaining (must clamp, not corrupt deferred ranks), absent host
    // (default), allow=false passthrough
    val rows = for {
      (h, k) <- Seq(("a", 5), ("b", 3), ("c", 4), ("d", 2))
      i <- 1 to k
    } yield (s"https://$h/p$i", h, 1, 0, (h.hashCode.toLong % 97) * 100 + i, i.toLong)
    val frontier = rows.toDF("url", "host", "depth", "retry", "seq", "host_rank")
    val budget = Seq(("a", 2L, true), ("b", 0L, true), ("c", -3L, false))
      .toDF("host", "remaining", "allow")
    def normalize(d: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) = (
      d._1.select("url", "robots_allow").collect().map(r => (r.getString(0), r.getBoolean(1))).toSet,
      d._2.select("url").collect().map(_.getString(0)).toSet)
    val fast = normalize(Crawler.dispatchSelect(frontier, budget, 1L))
    val fastBc = normalize(Crawler.dispatchSelect(frontier, budget, 1L, Some(3L), 1000000L))
    val fallback = normalize(Crawler.dispatchSelect(
      frontier.drop("host_rank"), budget, 1L))
    assert(fast == fallback)
    assert(fastBc == fallback)
    // deferred ranks stay the per-host consecutive 1..k invariant
    val (_, defer) = Crawler.dispatchSelect(frontier, budget, 1L, Some(3L))
    val ranks = defer.select("host", "seq", "host_rank").collect()
      .groupBy(_.getString(0))
      .map { case (h, rs) => h -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    ranks.values.foreach(seq => assert(seq == (1L to seq.length).toSeq))
  }

  test("frontier commits are an LSM: per-round bytes written ∝ added rows, not frontier size") {
    val root = Files.createTempDirectory("graft-crawl-lsm").toString
    val s = runEngine(root)
    val snap = new SnapshotTable(root)
    val byRound = (0 until s.rounds).map(r => r -> snap.kinds(r).get("frontier"))
    // steady-state rounds APPEND a delta tier holding EXACTLY that round's
    // new entries (admitted + requeued) — never a frontier rewrite
    val appendRounds = byRound.collect { case (r, Some("append")) => r }
    assert(appendRounds.nonEmpty, "no LSM append rounds — frontier is being rewritten")
    appendRounds.foreach { r =>
      val rows = spark.read.parquet(f"$root/data/frontier/r$r%05d").count()
      val st = s.stats(r)
      assert(rows == st.admitted,
        s"round $r frontier delta has $rows rows, expected admitted=${st.admitted}")
    }
    // rounds that add nothing and don't compact write NO frontier data at all
    byRound.foreach { case (r, k) =>
      if (k.isEmpty) assert(s.stats(r).admitted == 0)
    }
    // the raw LSM view (base + tiers, dead rows included) must still
    // resolve to the oracle-live frontier: drained crawl → zero live rows
    assert(Crawler.recentlyAdded(spark, root, 1000000).count() == 0)
    // and the schedule equals the oracle's (LSM is a storage layout, not a
    // semantics change)
    assert(engineSchedule(root, s.rounds - 1) ==
      oracleResult.schedule.map(l => (l.round, l.url, l.status)))
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
