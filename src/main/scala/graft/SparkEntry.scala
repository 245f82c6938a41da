package graft

import graft.functions.gf
import graft.operators.{Crawler, SearchIndex}
import graft.sources.CorpusGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` re-express the reference's operator inventory (SURVEY.md §2)
 * over the driver's TPC-H-ish testdata tables so each is DuckDB-checkable;
 * the crawl engine itself (frontier, politeness, bloom dedup, snapshots) is
 * exercised end-to-end by `entry` and gated by `sbt -batch test` against
 * the sequential oracle (BASELINE.md §B).
 *
 * Column-name discipline: every computed column is aliased identically in
 * the Spark plan and the oracle SQL. Money aggregates are summed as
 * DECIMAL(18,2) (exact, associative — deterministic under any partitioning)
 * and cast to DOUBLE at the end so both engines emit bit-identical values.
 */
object SparkEntry {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Flagship: a full crawl of the synthetic interleaved-span corpus —
   * frontier scheduling, politeness windows, robots gate, seen-dedup,
   * span extraction, per-round snapshots — then an inverted-index search
   * over what was crawled (SURVEY.md §3.1+§3.2 end-to-end). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nDocs = 1000L
    val cfg = CrawlConfig(maxDepth = 2, maxPagesPerDomain = 20,
      respectRobots = true, roundSeconds = 30.0)
    val root = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val summary = Crawler.run(spark, CorpusGen.docs(spark, nDocs),
      CorpusGen.seeds(nDocs, 3),
      CorpusGen.policies(nDocs, cfg.defaultCrawlDelayS, cfg.maxPagesPerDomain).toDS(),
      cfg, root, maxRounds = 8)
    val snap = new graft.plans.SnapshotTable(root)
    val docStore = snap.loadAppended(spark, "doc_store", summary.rounds - 1)
    SearchIndex.search(SearchIndex.postings(docStore), "spark crawl frontier", "content", 10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-class hash aggregation with exact decimal money sums (SURVEY §2.4;
    // pattern of the reference's domain_counts/score sums at engine scale)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),

    // A1 domain page counts: groupBy(host).count over a URL column derived
    // deterministically from events (gcloud_master.py:36,338)
    "q_domain_counts" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .select(concat(lit("https://h-"), col("user_id") % 50,
          lit(".example.test/p/"), col("event_id")).as("url"))
        .select(gf.url_policy_host(col("url")).as("host"))
        .groupBy("host").agg(count(lit(1)).as("page_count"))
    }),

    // D1 URL-seen dedup as a left-anti join: candidate urls minus seen urls
    // (gcloud_master.py:320-338)
    "q_seen_dedup" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      val candidates = ev.where(col("event_type") === "click")
        .select((col("event_id") * 13 % 2000).as("page_id"))
      val seen = ev.where(col("event_type") === "view")
        .select((col("event_id") * 13 % 2000).as("page_id")).distinct()
      candidates.join(seen, Seq("page_id"), "left_anti")
        .groupBy("page_id").agg(count(lit(1)).as("n"))
    }),

    // F7/O2 per-host ranked admission window: row_number over
    // (partition by host order by seq) <= cap (gcloud_master.py:61-62,335)
    "q_admission_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("host")).orderBy(col("seq"))
      s.read.parquet(t(dir, "events"))
        .select((col("user_id") % 50).as("host"), col("event_id").as("seq"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 10)
    }),

    // A2 failure-reason histogram (gcloud_master.py:676-686): group failed
    // events by a reason extracted from the JSON props payload
    "q_failure_histogram" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .where(col("event_type") === "error")
        .select(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int").as("reason"))
        .groupBy("reason").agg(count(lit(1)).as("n"))
    }),

    // A5/F10 status projection counters (cli.py:109-122)
    "q_status_counters" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          // milli-unit integer sum: exact and associative, so deterministic
          // under any partitioning AND bit-identical to the DuckDB oracle
          // (double→decimal cast rounding differs between engines)
          sum(floor(col("value") * 1000).cast("long")).as("total_value_milli"))
    }),

    // S13/O4 log tail: order by ts, keep last 200 (templates/app.py:1134-1139)
    "q_log_tail" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .orderBy(desc("ts"), desc("event_id"))
        .limit(200)
        .select("event_id", "ts", "event_type")
    }),

    // A3+J1+O1 search scoring: tokenize, per-term hit with title weight 2.0
    // / body 1.0 (title-first-wins), weighted sum per doc, top-10
    // (gcloud_indexer.py:37-101)
    "q_search_scoring" -> ((s, dir) => {
      val toks = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), gf.tokenize(col("text")).as("ts"))
        .withColumn("title_ts", slice(col("ts"), 1, 5))
      import s.implicits._
      val terms = Seq("spark", "data", "query").toDF("term")
      toks.crossJoin(broadcast(terms))
        .withColumn("w",
          when(array_contains(col("title_ts"), col("term")), lit(2.0))
            .when(array_contains(col("ts"), col("term")), lit(1.0)))
        .where(col("w").isNotNull)
        .groupBy("doc_id").agg(sum("w").as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(10)
    }),

    // C8 snippet: first 200 chars + '...' (gcloud_indexer.py:340)
    "q_snippet" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 200), lit("...")).as("snippet"))
    }),

    // exact dedup over documents: first doc_id wins per identical text
    // (training-data op; same shape as D1 at content level)
    "q_dedup_exact" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dupes"))
        .select("keep_id", "dupes")
    }),

    // document fingerprinting: md5 of whitespace-normalized lowercase text
    "q_fingerprint" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
    }),

    // token counting + quality scoring (training-data ops): whitespace
    // tokens, mean token length, stopword ratio
    "q_text_stats" -> ((s, dir) => {
      val stop = Seq("the", "a", "and", "of", "to")
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("n_chars"), gf.tokenize(col("text")).as("ts"))
        .select(col("doc_id"),
          size(col("ts")).cast("long").as("n_tokens"),
          (col("n_chars").cast("double") / size(col("ts"))).as("mean_tok_len"),
          (size(filter(col("ts"), x => x.isin(stop.map(lit(_)): _*))).cast("double")
            / size(col("ts"))).as("stopword_ratio"))
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_domain_counts" ->
      """SELECT 'h-' || (user_id % 50) || '.example.test' AS host,
        |       COUNT(*) AS page_count
        |FROM events GROUP BY 1""".stripMargin,
    "q_seen_dedup" ->
      """SELECT page_id, COUNT(*) AS n FROM (
        |  SELECT (event_id * 13) % 2000 AS page_id FROM events WHERE event_type = 'click'
        |) c WHERE page_id NOT IN (
        |  SELECT DISTINCT (event_id * 13) % 2000 FROM events WHERE event_type = 'view'
        |) GROUP BY page_id""".stripMargin,
    "q_admission_window" ->
      """SELECT host, seq, rnk FROM (
        |  SELECT user_id % 50 AS host, event_id AS seq,
        |         ROW_NUMBER() OVER (PARTITION BY user_id % 50 ORDER BY event_id) AS rnk
        |  FROM events
        |) WHERE rnk <= 10""".stripMargin,
    "q_failure_histogram" ->
      """SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS reason,
        |       COUNT(*) AS n
        |FROM events WHERE event_type = 'error' GROUP BY 1""".stripMargin,
    "q_status_counters" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS total_value_milli
        |FROM events GROUP BY event_type""".stripMargin,
    "q_log_tail" ->
      """SELECT event_id, ts, event_type FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 200""".stripMargin,
    "q_search_scoring" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                     x -> x != '') AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, ts, ts[1:5] AS title_ts FROM toks
        |), terms(term) AS (VALUES ('spark'), ('data'), ('query')),
        |hits AS (
        |  SELECT d.doc_id,
        |    CASE WHEN list_contains(d.title_ts, t.term) THEN 2.0
        |         WHEN list_contains(d.ts, t.term) THEN 1.0 END AS w
        |  FROM d CROSS JOIN terms t
        |)
        |SELECT doc_id, CAST(SUM(w) AS DOUBLE) AS score FROM hits
        |WHERE w IS NOT NULL GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q_snippet" ->
      "SELECT doc_id, substr(text, 1, 200) || '...' AS snippet FROM documents",
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dupes
        |FROM documents GROUP BY text""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "q_text_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, n_chars,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                     x -> x != '') AS ts
        |  FROM documents
        |)
        |SELECT doc_id, len(ts) AS n_tokens,
        |  CAST(n_chars AS DOUBLE) / len(ts) AS mean_tok_len,
        |  CAST(len(list_filter(ts, x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
        |    / len(ts) AS stopword_ratio
        |FROM toks""".stripMargin)
}
