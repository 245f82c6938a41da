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
