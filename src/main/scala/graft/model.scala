package graft

/**
 * Core row types of the engine (SURVEY.md §1.1).
 *
 * These mirror the record shapes the reference passes around as JSON dicts
 * (CrawlRequest `gcloud_master.py:343-348`, CrawlResult
 * `gcloud_crawler.py:323-344`, CrawlState `gcloud_master.py:29-48`,
 * postings `gcloud_indexer.py:57-62`) re-expressed as typed case classes so
 * the pipeline is a `Dataset[T]` spine with Catalyst-visible schemas.
 *
 * Determinism note: nothing here carries wall-clock time. The reference
 * stamps ISO-8601 wall-clock timestamps on every record; we stamp the round
 * id (and a stable per-row sequence) instead so crawl ordering and
 * resume-from-round are exactly reproducible.
 */

/** One ordered span of an interleaved text+media document
 * (driver-mandated input shape, BASELINE.json:input_hint).
 * kind ∈ {title, text, link, media}; text is '' for pure media;
 * media_ref is the raw link/media target ('' for text); offset is the
 * 0-based position in document order — the per-row invariant is
 * span-sequence equality on (kind, text, media_ref, offset). */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A crawlable document: doc_id is the canonical URL; raw is the
 * interleaved serialized form the extractor must parse; spans is the
 * golden parse (kept for invariant checks, never read by the engine);
 * content_type gates parsing (reference: only text/html is parsed,
 * gcloud_crawler.py:285-344). */
case class Doc(doc_id: String, raw: String, content_type: String,
               flaky_fails: Int, spans: Seq[Span])

/** Deterministic BFS-with-priority sequence key (SURVEY.md §2.6 O2).
 * Reference order: FIFO deque, children appended in link-document-order at
 * depth+1 (gcloud_master.py:31,336). Our total order is
 * (depth, round, parent_seq, link_pos) — strictly increasing along the BFS
 * and independent of partitioning/parallelism. */
case class SeqKey(depth: Int, round: Int, parent_seq: Long, link_pos: Int)

/** A frontier entry: a URL admitted to the crawl but not yet fetched.
 * url is canonical; url_hash = xxhash64(url) is the dedup key; host kept
 * denormalized (politeness/caps are per-host); seq is the flattened total
 * order used for dispatch (encodes SeqKey, see CrawlRound.seqColumn). */
case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    depth: Int,
    retry: Int,
    seq: Long)

/** Result of "fetching" (joining against the corpus) one frontier entry.
 * status ∈ {ok, failed, skipped_robots, skipped_domain, non_html}.
 * links are canonicalized absolute child URLs in document order. */
case class FetchResult(
    round: Int,
    url: String,
    host: String,
    depth: Int,
    seq: Long,
    status: String,
    error: String,
    title: String,
    text: String,
    links: Seq[String])

/** Per-host crawl policy (robots + politeness + caps), the broadcastable
 * equivalent of RobotsCache + config (gcloud_crawler.py:37-47,
 * config/crawl_config.json:5-11). */
case class HostPolicy(host: String, allow: Boolean, crawl_delay_s: Double, max_pages: Int)

/** Crawl configuration (config/crawl_config.json + defaults
 * gcloud_master.py:174-192). roundSeconds is the politeness budget window:
 * a host with crawl_delay d may be dispatched at most
 * floor(roundSeconds/d) URLs per round (SURVEY.md §2.8 T4). */
case class CrawlConfig(
    maxDepth: Int = 2,
    maxPagesPerDomain: Int = 10,
    respectRobots: Boolean = true,
    defaultCrawlDelayS: Double = 1.0,
    allowedDomains: Seq[String] = Nil,
    maxRetries: Int = 3,
    roundSeconds: Double = 60.0,
    /** seen-set prefilter kind: "bloom" (default) or "cuckoo" (deletable —
     * required for the reset-failures "forget" flow, SURVEY §2.3 D4/U4). */
    seenSketch: String = "bloom",
    /** initial sketch capacity; the crawler rebuilds at 4x on saturation. */
    sketchCapacity: Long = 1L << 20,
    /** dispatched-set size up to which the fetch join broadcasts; past it
     * the round switches to bloom-pruned scan + shuffle-hash join (the
     * per-host politeness budget grows with round number, so the
     * dispatched slice is NOT bounded — an unconditional broadcast would
     * eventually exceed driver/executor memory). */
    broadcastRowLimit: Long = 1000000L) {
  /** allowed_domains semantics of gcloud_master.py:50-59: blank entries are
   * ignored; empty effective list ⇒ allow all; else case-insensitive exact
   * or dot-suffix match. */
  def effectiveAllowed: Seq[String] =
    allowedDomains.map(_.trim.toLowerCase).filter(_.nonEmpty)
}

/** One inverted-index posting (gcloud_indexer.py:57-62): weight 2.0 for
 * title hits, 1.0 for body hits. */
case class Posting(term: String, url: String, weight: Double, title: String)

/** Per-round counters row (CrawlState sizes, gcloud_master.py:686-688). */
case class RoundCounters(
    round: Int,
    dispatched: Long,
    completed: Long,
    failed: Long,
    deferred: Long,
    frontier_size: Long,
    seen_size: Long)
