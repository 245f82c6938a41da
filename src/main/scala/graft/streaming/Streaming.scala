package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** A fetch request flowing through the streaming politeness gate. */
case class FetchRequest(url: String, host: String, ts: java.sql.Timestamp)

/** A scheduled fetch: fetch_at ≥ ts and ≥ previous fetch_at + delay for
 * the same host (the reference's min-interval sleep, made explicit). */
case class ScheduledFetch(url: String, host: String,
                          ts: java.sql.Timestamp, fetch_at: java.sql.Timestamp)

/**
 * Structured-Streaming counterparts of the engine's stateful operators
 * (SURVEY.md §2.8). The BSP round pipeline stays the system of record —
 * exact-ordering replay and resume-from-round are requirements there —
 * but where a deployment ingests a live event/request stream, these give
 * the same semantics in incremental form:
 *
 *  - T4 politeness window → [[politenessSchedule]]: keyed state per host,
 *    `flatMapGroupsWithState`, assigning each request the earliest
 *    fetch slot ≥ max(event time, last slot + crawl_delay).
 *  - wall-clock status counters (A5/F10) → [[windowedCounts]]:
 *    watermarked event-time tumbling windows, late data dropped after the
 *    watermark horizon.
 */
object Streaming {

  /** Watermarked tumbling-window aggregation over an events stream
   * (schema: ts timestamp, event_type string, value double). Append-mode
   * safe: windows finalize once the watermark passes. */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     win: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("value_milli"))

  /** Streaming URL-seen dedup (D1 in incremental form): first sight of a
   * canonical URL wins; duplicates arriving within the watermark horizon of
   * the first sight are dropped. `dropDuplicatesWithinWatermark` keys state
   * by url alone yet EVICTS each entry once the watermark passes its event
   * time — with plain `dropDuplicates(url)` the url-keyed state would grow
   * unboundedly because eviction requires the event-time column among the
   * keys. Bounded state is the trade: a duplicate arriving after the
   * horizon re-emits, and a late row older than the current watermark is
   * dropped before dedup ever sees it (so a late FIRST sight is lost) —
   * both inherent to any watermarked stream; the batch engine's snapshot
   * seen-set remains the exact, unbounded system of record. */
  def seenDedup(candidates: DataFrame, urlCol: String, tsCol: String,
                watermark: String = "1 hour"): DataFrame =
    candidates
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(urlCol)

  /** Per-host politeness scheduling with keyed state: within each host,
   * requests (processed in event-time order per micro-batch) receive
   * fetch_at = max(ts, last_fetch_at + delay). State is one timestamp per
   * host — O(hosts), the same footprint as the reference's
   * last_crawl_time map (gcloud_crawler.py:94, 229-236). */
  def politenessSchedule(requests: Dataset[FetchRequest],
                         delayMillisPerHost: Map[String, Long],
                         defaultDelayMillis: Long): Dataset[ScheduledFetch] = {
    import requests.sparkSession.implicits._
    val delays = requests.sparkSession.sparkContext.broadcast(delayMillisPerHost)

    def gate(host: String, batch: Iterator[FetchRequest],
             state: GroupState[Long]): Iterator[ScheduledFetch] = {
      val delay = delays.value.getOrElse(host, defaultDelayMillis)
      var last = state.getOption.getOrElse(Long.MinValue)
      val out = batch.toSeq.sortBy(r => (r.ts.getTime, r.url)).map { r =>
        val at = math.max(r.ts.getTime, if (last == Long.MinValue) r.ts.getTime else last + delay)
        last = at
        ScheduledFetch(r.url, r.host, r.ts, new java.sql.Timestamp(at))
      }
      state.update(last)
      out.iterator
    }

    requests.groupByKey(_.host).flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(gate)
  }
}
