package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * Async search request/response tables (SURVEY §2.1 S11 full form;
 * gcloud_indexer.py:588-632): callers append rows to a `search_requests`
 * spool; a processing pass picks up every request that has no response
 * yet, runs it against the PERSISTED postings table of the crawl at
 * `crawlRoot` (Crawler.searchStore — index is never recomputed), and
 * appends the ranked results to `search_responses`. Pure tables in/out —
 * the reference's poll loop becomes an idempotent micro-batch: re-running
 * processPending answers only still-unanswered requests.
 *
 * Layout (outside the crawl's round snapshots — requests arrive between
 * rounds and must not perturb resume):
 *   root/search_requests/b<k>/   (req_id, query, field, k)
 *   root/search_responses/b<k>/  (req_id, rank, url, score, title, snippet)
 */
class SearchService(val root: String) {

  private def reqDir = s"$root/search_requests"
  private def respDir = s"$root/search_responses"

  private def nextBatch(dir: String): String = {
    val p = Paths.get(dir)
    val n = if (Files.isDirectory(p))
      scala.util.Using.resource(Files.list(p))(_.count()) else 0L
    f"$dir/b$n%05d"
  }

  private def loadAll(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return None
    val dirs = scala.util.Using.resource(Files.list(p))(
      _.iterator().asScala.map(_.toString).toSeq).sorted
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Append one search request. */
  def submit(spark: SparkSession, reqId: String, query: String,
             field: String = "content", k: Int = 10): Unit = {
    import spark.implicits._
    Seq((reqId, query, field, k)).toDF("req_id", "query", "field", "k")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(nextBatch(reqDir))
  }

  /** Requests with no response yet (req_id anti-join). */
  def pending(spark: SparkSession): DataFrame = {
    val reqs = loadAll(spark, reqDir).getOrElse(
      return spark.emptyDataFrame)
    loadAll(spark, respDir) match {
      case Some(resp) => reqs.join(resp.select("req_id").distinct(),
        Seq("req_id"), "left_anti")
      case None => reqs
    }
  }

  /** Answer every pending request against the crawl's persisted postings.
   * Returns the number of requests answered. The pending set is
   * human-sized (it is the interactive query queue), so collecting it to
   * plan one search per request is the intended scale shape — each search
   * itself runs distributed over the postings table. */
  def processPending(spark: SparkSession, crawlRoot: String): Long = {
    val todo = pending(spark).collect()
    if (todo.isEmpty) return 0L
    val answers = todo.toSeq.map { r =>
      val reqId = r.getAs[String]("req_id")
      Crawler.searchStore(spark, crawlRoot, r.getAs[String]("query"),
        r.getAs[String]("field"), r.getAs[Int]("k"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("score"), asc("url"))).cast("long"))
        .select(lit(reqId).as("req_id"), col("rank"), col("url"),
          col("score"), col("title"), col("snippet"))
    }
    answers.reduce(_ unionByName _)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(nextBatch(respDir))
    todo.length.toLong
  }

  /** All responses so far. */
  def responses(spark: SparkSession): DataFrame =
    loadAll(spark, respDir).getOrElse(spark.emptyDataFrame)
}
