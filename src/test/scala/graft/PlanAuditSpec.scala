package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan audits: the 100 TB story depends on the optimizer seeing
 * what we mean — filters reaching the parquet scan, small dims broadcast,
 * top-k never full-sorting, column pruning keeping scans narrow. These
 * lock the plan shape so a refactor can't silently regress it.
 */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg pushes the shipdate filter into the parquet scan and prunes columns") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$p")
    // projection pruning: the scan must not read unused wide columns
    assert(!p.contains("l_comment"), "scan reads pruned column l_comment")
  }

  test("q_join_agg broadcasts the nation dim and keeps hash aggregation partial") {
    val p = plan("q_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(p.contains("HashAggregate"), "no hash aggregation")
  }

  test("q_search_scoring top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q_search_scoring")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered in:\n$p")
  }

  test("q_log_tail plans as TakeOrderedAndProject") {
    val p = plan("q_log_tail")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered in:\n$p")
  }

  test("q_semi_join and q_anti_join plan as semi/anti hash joins, not materialized subqueries") {
    assert(plan("q_semi_join").contains("LeftSemi"), "semi join lost")
    assert(plan("q_anti_join").contains("LeftAnti"), "anti join lost")
  }

  test("whole-stage codegen covers the scalar operators (custom expressions included)") {
    // `*(n)` prefixes in the executed plan mark WholeStageCodegen spans
    Seq("q_fingerprint", "q_token_counts", "q_url_hygiene").foreach { q =>
      val p = plan(q)
      assert(p.contains("*(1)"), s"$q fell out of whole-stage codegen:\n$p")
    }
  }

  test("admit stays barrier-free: disjoint branch exchanges, no materialization (r3 hot-path fix)") {
    // Catalyst pushes the deterministic probe below the dedup aggregation,
    // so the sketch-positive and sketch-negative branches each exchange a
    // DISJOINT candidate slice (combined volume = one full shuffle) with
    // the codegen'd source re-run per branch. Both alternatives measured
    // slower: r2's eager localCheckpoint (the sched regression) and a
    // serialized persist (collapses 32-core throughput). Lock the winning
    // shape: exactly two url-keyed exchanges, probe pushed into both
    // branches, and NO RDD-scan/cache barrier anywhere in the plan.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cand = spark.range(1000).select(
      concat(lit("https://h-"), pmod(col("id"), lit(7)),
        lit(".example.test/p/"), col("id")).as("url"),
      concat(lit("h-"), pmod(col("id"), lit(7)), lit(".example.test")).as("host"),
      lit(1).as("depth"), lit(0).as("retry"), col("id").as("ord1"), lit(0).as("ord2"))
    val seen = spark.range(100)
      .select(concat(lit("https://h-0.example.test/p/"), col("id")).as("url"))
    val sketch = graft.functions.SeenSketch.build(seen, "url", "bloom", 1024)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val p = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.operators.Crawler.admit(spark, cand, seen,
        Seq.empty[(String, Long)].toDF("host", "cnt"),
        CrawlConfig(maxPagesPerDomain = 1000), Some(sketch))
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val urlExchanges = "Exchange hashpartitioning\\(url".r.findAllIn(p).size
    assert(urlExchanges == 2, s"expected 2 disjoint branch exchanges, got $urlExchanges:\n$p")
    val probes = "sketch_contains".r.findAllIn(p).size
    assert(probes >= 2, s"probe not pushed into both branches:\n$p")
    assert(!p.contains("Scan ExistingRDD") && !p.contains("InMemoryTableScan"),
      s"admission pipeline materialized mid-plan:\n$p")
  }

  test("folded seen LSM: anti-join chain adds NO exchange and NO sort on any seen tier") {
    // run() maintains seen as foldSeen tiers (url-partitioned, sorted,
    // checkpointed base + per-round deltas). The admission anti-join chain
    // must consume every tier AS-IS: the only url exchange left in the
    // plan is the dedup aggregation's own, and the only url sort is the
    // candidate side's one-time sort — a 10^10-row seen set re-shuffled or
    // re-sorted per round is the 100 TB cost this shape exists to kill.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cand = spark.range(1000).select(
      concat(lit("https://h-"), pmod(col("id"), lit(7)),
        lit(".example.test/p/"), col("id")).as("url"),
      concat(lit("h-"), pmod(col("id"), lit(7)), lit(".example.test")).as("host"),
      lit(1).as("depth"), lit(0).as("retry"), col("id").as("ord1"), lit(0).as("ord2"))
    val base = graft.operators.Crawler.foldSeen(spark.range(5000)
      .select(concat(lit("https://h-0.example.test/p/"), col("id")).as("url")))
    val delta = graft.operators.Crawler.foldSeen(spark.range(5000, 5100)
      .select(concat(lit("https://h-0.example.test/p/"), col("id")).as("url")))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val p = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.operators.Crawler.admit(spark, cand, base,
        Seq.empty[(String, Long)].toDF("host", "cnt"),
        CrawlConfig(maxPagesPerDomain = 1000000), None, Seq(delta))
        .queryExecution.executedPlan.toString
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    val tierIds = "Scan ExistingRDD\\[url#(\\d+)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(tierIds.size == 2, s"expected both seen tiers as bare checkpoint scans:\n$p")
    // nothing may be inserted above a tier scan: no exchange and no sort
    // anywhere in the plan references a tier's url attribute (the
    // candidate side's own sorts/exchange reference ITS url attribute)
    tierIds.foreach { id =>
      assert(!p.contains(s"Exchange hashpartitioning(url#$id"),
        s"seen tier url#$id re-exchanged:\n$p")
      assert(!p.contains(s"Sort [url#$id"),
        s"seen tier url#$id re-sorted:\n$p")
    }
    val urlExchanges = "Exchange hashpartitioning\\(url".r.findAllIn(p).size
    assert(urlExchanges == 1,
      s"expected ONLY the dedup aggregation's url exchange, got $urlExchanges:\n$p")
  }

  test("simhash pair join: ONE shared exchange, distinct-free pair dedup (r4 shape)") {
    // the self-join's two sides must REUSE a single (tbl, key) exchange
    // (fingerprints computed once, no eager checkpoint), and pair dedup is
    // the first-clean-table filter — there must be NO aggregate (distinct)
    // anywhere in the plan. Disable AQE/broadcast so the exchange tree is
    // inspectable at test scale.
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val p = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries("q_dedup_simhash")(spark, dir)
        .queryExecution.executedPlan.toString
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // count real exchange NODES only (a ReusedExchange line repeats the
    // reused exchange's description text)
    val tblExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(tbl") && !l.contains("ReusedExchange"))
    assert(tblExchanges == 1, s"expected ONE shared (tbl,key) exchange, got $tblExchanges:\n$p")
    assert(p.contains("ReusedExchange"), s"self-join sides do not share the exchange:\n$p")
    assert(!p.contains("HashAggregate"),
      s"a distinct/aggregate crept back into the pair pipeline:\n$p")
    assert(p.contains("simhash_first_table"), s"first-clean-table dedup filter missing:\n$p")
  }

  test("minhash LSH shuffles narrow banded rows, not shingle arrays") {
    // the band-bucket self-join must shuffle only (band, bhash, doc-id)
    // rows; the wide shingle arrays join back AFTER candidate pruning.
    // At test scale the optimizer (rightly) broadcasts instead — disable
    // broadcast (and AQE, so exchanges are inspectable as a plain tree)
    // to surface the at-scale shuffle plan.
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = SparkEntry.queries("q_dedup_minhash")(spark, dir)
      df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("band") =>
          e.child.schema.fieldNames.toSeq
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    assert(exchanges.nonEmpty, "no band-keyed exchange found")
    exchanges.foreach { cols =>
      assert(cols.size <= 3 && !cols.exists(_.startsWith("sh")),
        s"banded shuffle carries wide columns: $cols")
    }
  }
}
