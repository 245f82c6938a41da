package graft

import graft.operators.Crawler
import graft.sources.CorpusGen
import java.nio.file.Files

/** Local-iteration profiler (not a test): runs the ResetFailuresSpec crawl
 * scenario with SPARK_GRAFT_CRAWL_TRACE=1 per-round timing, so per-round
 * fixed-cost regressions show up as numbers instead of slow suites.
 * Run: sbt 'Test/runMain graft.ProfileCrawl'. */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val nDocs = 400L
    val cfg = CrawlConfig(
      maxDepth = 3, maxPagesPerDomain = 25, respectRobots = true,
      defaultCrawlDelayS = 1.0, maxRetries = 1, roundSeconds = 5.0)
    val root = Files.createTempDirectory("graft-profile").toString
    val t0 = System.nanoTime()
    val s = Crawler.run(spark, CorpusGen.docs(spark, nDocs),
      CorpusGen.seeds(nDocs, 3),
      CorpusGen.policies(nDocs, cfg.defaultCrawlDelayS, cfg.maxPagesPerDomain).toDS(),
      cfg, root, 10000, 0L)
    System.err.println(f"[profile] total=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rounds=${s.rounds}")
    spark.stop()
  }
}
