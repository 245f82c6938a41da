package graft

import graft.functions.UrlKit
import graft.sources.{ConfigSource, Seeds}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S1 (config JSON source), S2 (file-of-lines seed source), and F2
 * (domain validation) — semantics pinned to the reference
 * (config/crawl_config.json, cli.py:18-36). */
class ConfigSourceSpec extends AnyFunSuite {

  test("config JSON maps the reference's keys; missing keys keep defaults") {
    val (cfg, seedUrls) = ConfigSource.fromJsonString(
      """{"seed_urls": ["https://a.example.test/", "https://b.example.test/x"],
        | "max_depth": 5, "max_pages_per_domain": 7, "respect_robots": false,
        | "crawl_delay": 2.5, "allowed_domains": ["example.test", ""],
        | "start_time": "2026-02-12T17:13:23", "unknown_key": 1}""".stripMargin)
    assert(cfg.maxDepth == 5 && cfg.maxPagesPerDomain == 7)
    assert(!cfg.respectRobots && cfg.defaultCrawlDelayS == 2.5)
    // blank allowed_domains entries are ignored (gcloud_master.py:50-59)
    assert(cfg.effectiveAllowed == Seq("example.test"))
    assert(cfg.maxRetries == CrawlConfig().maxRetries) // default kept
    assert(seedUrls == Seq("https://a.example.test/", "https://b.example.test/x"))
  }

  test("env-var config form + resolution chain (S1, gcloud_crawler.py:155-210)") {
    // full env set
    val env = Map(
      "CRAWLER_MAX_DEPTH" -> "7", "CRAWLER_MAX_PAGES_PER_DOMAIN" -> "42",
      "CRAWLER_RESPECT_ROBOTS" -> "False", "CRAWLER_CRAWL_DELAY" -> "0.25",
      "CRAWLER_MAX_RETRIES" -> "2",
      "CRAWLER_ALLOWED_DOMAINS" -> "a.test, B.Test ,c.test")
    val cfg = ConfigSource.fromEnv(env)
    assert(cfg.maxDepth == 7 && cfg.maxPagesPerDomain == 42)
    assert(!cfg.respectRobots && cfg.defaultCrawlDelayS == 0.25)
    assert(cfg.maxRetries == 2)
    assert(cfg.effectiveAllowed == Seq("a.test", "b.test", "c.test"))
    // missing variables take the reference's env-branch defaults
    // (3/25/true/1.0/5/empty — gcloud_crawler.py:185-196)
    val d = ConfigSource.fromEnv(Map.empty)
    assert(d.maxDepth == 3 && d.maxPagesPerDomain == 25 && d.respectRobots)
    assert(d.defaultCrawlDelayS == 1.0 && d.maxRetries == 5)
    assert(d.allowedDomains.isEmpty)
    // resolution CHAIN: a present JSON file wins outright; otherwise env
    val f = Files.createTempFile("cfg", ".json")
    Files.writeString(f, """{"max_depth": 9}""")
    assert(ConfigSource.resolve(Some(f.toString), env)._1.maxDepth == 9)
    assert(ConfigSource.resolve(Some("/nonexistent.json"), env)._1.maxDepth == 7)
    assert(ConfigSource.resolve(None, Map.empty)._1.maxDepth == 3)
  }

  test("seed file: one URL per line, blanks dropped, invalid URLs filtered") {
    val f = Files.createTempFile("seeds", ".txt")
    Files.writeString(f,
      """https://ok.example.test/
        |
        |   https://trimmed.example.test/p
        |not-a-url
        |mailto:x@example.test
        |http://also-ok.test/q?x=1
        |""".stripMargin)
    assert(Seeds.fromFile(f.toString) == Seq(
      "https://ok.example.test/",
      "https://trimmed.example.test/p",
      "http://also-ok.test/q?x=1"))
  }

  test("domain validation matches the reference regex (cli.py:18-21)") {
    val valid = Seq("example.com", "sub.example.co", "a.bc",
      "h-0.example.test", "a1-b2.c3-d4.org")
    val invalid = Seq("bad_domain", "x.t", "-bad.example.test",
      "bad-.example.test", "http://example.com", "example.com/path",
      "example.", ".example.com", "example", "ex ample.com",
      ("a" * 64) + ".com")
    valid.foreach(d => assert(UrlKit.isValidDomain(d), s"should accept $d"))
    invalid.foreach(d => assert(!UrlKit.isValidDomain(d), s"should reject $d"))
    // 63-char label is the boundary case the {0,61} core encodes
    assert(UrlKit.isValidDomain(("a" * 63) + ".com"))
  }

  test("url validation: scheme + netloc required (cli.py:23-29)") {
    assert(UrlKit.isValidUrl("https://x.test/p"))
    assert(UrlKit.isValidUrl("http://x.test"))
    assert(!UrlKit.isValidUrl("x.test/p"))
    assert(!UrlKit.isValidUrl("mailto:x@example.test"))
    assert(!UrlKit.isValidUrl(""))
  }
}
