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

  /** Env-var config form (S1 fallback layer, gcloud_crawler.py:183-199):
   * CRAWLER_MAX_DEPTH / CRAWLER_MAX_PAGES_PER_DOMAIN /
   * CRAWLER_RESPECT_ROBOTS / CRAWLER_CRAWL_DELAY / CRAWLER_MAX_RETRIES /
   * CRAWLER_ALLOWED_DOMAINS (comma-separated). Missing variables take the
   * reference's env-branch defaults (3 / 25 / true / 1.0 / 5 / empty —
   * deliberately DIFFERENT from CrawlConfig's DEFAULT_CONFIG-derived
   * defaults, as in the reference). `env` is injectable for tests. */
  def fromEnv(env: Map[String, String] = sys.env): CrawlConfig =
    CrawlConfig().copy(
      maxDepth = env.get("CRAWLER_MAX_DEPTH").map(_.trim.toInt).getOrElse(3),
      maxPagesPerDomain =
        env.get("CRAWLER_MAX_PAGES_PER_DOMAIN").map(_.trim.toInt).getOrElse(25),
      respectRobots = env.get("CRAWLER_RESPECT_ROBOTS")
        .map(_.trim.toLowerCase == "true").getOrElse(true),
      defaultCrawlDelayS =
        env.get("CRAWLER_CRAWL_DELAY").map(_.trim.toDouble).getOrElse(1.0),
      maxRetries = env.get("CRAWLER_MAX_RETRIES").map(_.trim.toInt).getOrElse(5),
      allowedDomains = env.get("CRAWLER_ALLOWED_DOMAINS").filter(_.nonEmpty)
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil))

  /** The reference's config resolution CHAIN (gcloud_crawler.py:155-210):
   * JSON file if it exists → env vars → defaults. (A chain of whole
   * sources, not a per-key merge — a present JSON file wins outright,
   * exactly as in the reference.) Returns (config, seeds); the env/default
   * layers carry no seed list. */
  def resolve(jsonPath: Option[String],
              env: Map[String, String] = sys.env): (CrawlConfig, Seq[String]) =
    jsonPath.filter(p => Files.exists(Paths.get(p))) match {
      case Some(p) => fromJson(p)
      case None => (fromEnv(env), Nil)
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
