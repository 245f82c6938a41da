package graft.oracle

import graft.{CrawlConfig, Doc, HostPolicy}
import graft.functions.{SpanKit, UrlKit}
import scala.collection.mutable

/**
 * Single-threaded executable model of the reference crawler's semantics
 * (SURVEY.md §5.1): BFS FIFO queue (gcloud_master.py:31,336,655-665),
 * first-sight seen-dedup (:320-338), enqueue-time domain caps (:61-62,335),
 * depth gate (:425-427), allowed-domains (:50-59), timeout-retry ladder
 * (:497-531 happy path), politeness as a per-host min-interval schedule
 * (gcloud_crawler.py:229-236) discretized into rounds of cfg.roundSeconds.
 *
 * The Spark engine must reproduce this model's dispatch schedule and seen
 * set EXACTLY — that is the driver-mandated correctness gate
 * (BASELINE.json:metric). The model shares only the leaf string functions
 * (SpanKit/UrlKit, pinned by their own golden tests); all queue/state
 * logic here is independent sequential code.
 */
class CrawlOracle(docs: Map[String, Doc], policies: Map[String, HostPolicy],
                  cfg: CrawlConfig) {

  case class Entry(url: String, host: String, depth: Int, retry: Int)
  case class LogRow(round: Int, slot: Int, url: String, status: String)
  case class Result(
      schedule: Seq[LogRow],               // exact dispatch order
      seen: Seq[String],                   // insertion order
      completed: Seq[String], failed: Seq[String],
      hostCounts: Map[String, Long], rounds: Int)

  private def delayOf(host: String): Double =
    policies.get(host).map(_.crawl_delay_s).filter(_ > 0)
      .getOrElse(cfg.defaultCrawlDelayS)
  private def allowedByRobots(host: String): Boolean =
    !cfg.respectRobots || policies.get(host).forall(_.allow)
  private def domainAllowed(host: String): Boolean = {
    val a = cfg.effectiveAllowed
    a.isEmpty || a.exists(d => host == d || host.endsWith("." + d))
  }

  def run(seedUrls: Seq[String], maxRounds: Int = 10000,
          seedFeed: Int => Seq[String] = _ => Nil): Result = {
    val queue = mutable.ArrayDeque.empty[Entry]
    val seen = mutable.LinkedHashSet.empty[String]
    val hostCounts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    val dispatchedPerHost = mutable.Map.empty[String, Long].withDefaultValue(0L)
    val schedule = mutable.ArrayBuffer.empty[LogRow]
    val completed = mutable.ArrayBuffer.empty[String]
    val failed = mutable.ArrayBuffer.empty[String]
    // problematic-domain quarantine (F9): hosts whose URLs exhausted their
    // retries; effective from the NEXT round (BSP boundary normalization)
    val quarantined = mutable.Set.empty[String]

    // admission gate — the add_urls_to_queue loop, per candidate in order
    def tryAdmit(url: String, depth: Int): Unit = {
      if (seen.contains(url)) return
      val host = UrlKit.policyHost(url)
      if (!domainAllowed(host)) return
      if (hostCounts(host) >= cfg.maxPagesPerDomain) return // not marked seen!
      seen += url
      hostCounts(host) += 1
      queue.append(Entry(url, host, depth, 0))
    }

    seedUrls.foreach(tryAdmit(_, 0))

    var round = 0
    while ((queue.nonEmpty || seedFeed(round).nonEmpty) && round < maxRounds) {
      // config hot-reload (T5): newly-appeared seeds admitted at depth 0
      // at the round boundary, appended at the back of the queue
      seedFeed(round).foreach(tryAdmit(_, 0))
      // politeness window: first remaining(host) queue entries per host
      val remaining = mutable.Map.empty[String, Long]
      def rem(host: String): Long = remaining.getOrElseUpdate(host,
        math.floor((round + 1) * cfg.roundSeconds / delayOf(host)).toLong -
          dispatchedPerHost(host))
      val taken = mutable.Map.empty[String, Long].withDefaultValue(0L)
      val dispatched = mutable.ArrayBuffer.empty[Entry]
      val kept = mutable.ArrayBuffer.empty[Entry]
      queue.foreach { e =>
        if (taken(e.host) < rem(e.host)) { taken(e.host) += 1; dispatched += e }
        else kept += e
      }
      queue.clearAndShrink()
      queue.appendAll(kept)
      dispatched.foreach(e => dispatchedPerHost(e.host) += 1)

      val requeues = mutable.ArrayBuffer.empty[Entry]
      val expansions = mutable.ArrayBuffer.empty[(Entry, Seq[String])]
      val newlyQuarantined = mutable.Set.empty[String]

      dispatched.zipWithIndex.foreach { case (e, slot) =>
        val status =
          if (quarantined(e.host)) "quarantined" // checked first, as in ref
          else if (!allowedByRobots(e.host)) "skipped_robots"
          else docs.get(e.url) match {
            case None => "failed"
            case Some(d) if e.retry < d.flaky_fails => "timeout"
            case Some(d) if d.content_type != "text/html" => "ok_non_html"
            case Some(_) => "ok"
          }
        schedule += LogRow(round, slot, e.url, status)
        status match {
          case "ok" =>
            completed += e.url
            if (e.depth < cfg.maxDepth) {
              val links = SpanKit.extract(docs(e.url).raw).toSeq
                .filter(_.kind == "link")
                .flatMap(s => Option(UrlKit.canonicalize(e.url, s.media_ref)))
              expansions += ((e, links))
            }
          case "ok_non_html" => completed += e.url
          case "timeout" =>
            if (e.retry + 1 <= cfg.maxRetries)
              requeues += e.copy(retry = e.retry + 1)
            else {
              failed += e.url
              newlyQuarantined += e.host // F9: retries exhausted
            }
          case _ => failed += e.url
        }
      }
      quarantined ++= newlyQuarantined

      // requeued timeouts go to the back first (check_timeouts precedes
      // process_results in the master loop), then children in BFS order
      requeues.foreach(queue.append)
      expansions.foreach { case (e, links) =>
        links.foreach(tryAdmit(_, e.depth + 1))
      }
      round += 1
    }

    Result(schedule.toSeq, seen.toSeq, completed.toSeq, failed.toSeq,
      hostCounts.toMap, round)
  }
}
