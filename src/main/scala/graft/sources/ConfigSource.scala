package graft.sources

import graft.CrawlConfig
import graft.functions.UrlKit
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * Config source (SURVEY §2.1 S1): the reference's crawl_config.json
 * (config/crawl_config.json; defaults gcloud_master.py:174-192) read into
 * the typed [[CrawlConfig]] plus the seed list. Unknown keys are ignored;
 * missing keys keep the CrawlConfig defaults — the same merge the
 * reference does over its DEFAULT_CONFIG dict.
 */
object ConfigSource {

  /** Parse a crawl_config.json. Returns (config, seed_urls). */
  def fromJson(path: String): (CrawlConfig, Seq[String]) =
    fromJsonString(Files.readString(Paths.get(path)))

  def fromJsonString(json: String): (CrawlConfig, Seq[String]) = {
    val node = new ObjectMapper().readTree(json)
    val d = CrawlConfig()
    def intOr(k: String, v: Int) = if (node.has(k)) node.get(k).asInt(v) else v
    def dblOr(k: String, v: Double) = if (node.has(k)) node.get(k).asDouble(v) else v
    def boolOr(k: String, v: Boolean) = if (node.has(k)) node.get(k).asBoolean(v) else v
    def strList(k: String): Seq[String] =
      if (node.has(k) && node.get(k).isArray)
        node.get(k).elements().asScala.map(_.asText()).toSeq
      else Nil
    val cfg = d.copy(
      maxDepth = intOr("max_depth", d.maxDepth),
      maxPagesPerDomain = intOr("max_pages_per_domain", d.maxPagesPerDomain),
      respectRobots = boolOr("respect_robots", d.respectRobots),
      defaultCrawlDelayS = dblOr("crawl_delay", d.defaultCrawlDelayS),
      allowedDomains = strList("allowed_domains"),
      maxRetries = intOr("max_retries", d.maxRetries))
    (cfg, strList("seed_urls"))
  }
}

/**
 * Seed source (SURVEY §2.1 S2): file of one URL per line
 * (cli.py:31-36 load_urls_from_file) — blank lines dropped, entries
 * failing the scheme+netloc validation (cli.py:23-29) filtered out,
 * file order preserved. Seed files are human-sized, so this reads on the
 * driver; the admitted seeds enter the distributed frontier immediately.
 */
object Seeds {
  def fromFile(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.iterator
      .map(_.trim).filter(_.nonEmpty)
      .filter(UrlKit.isValidUrl)
      .toSeq
}
