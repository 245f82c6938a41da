package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the driver contract — entry returns rows; every query runs on
 * sf0.001 and every oracle key points at an existing query. Value-level
 * correctness is the driver's DuckDB gate (replicated in tools/compare.py). */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("entry (flagship crawl + search) returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, name)
    }
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k), k))
  }
}
