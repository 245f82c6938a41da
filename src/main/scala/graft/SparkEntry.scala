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
    Crawler.run(spark, CorpusGen.docs(spark, nDocs),
      CorpusGen.seeds(nDocs, 3),
      CorpusGen.policies(nDocs, cfg.defaultCrawlDelayS, cfg.maxPagesPerDomain).toDS(),
      cfg, root, maxRounds = 8)
    // search the PERSISTED incremental postings table (T8) — no recompute
    Crawler.searchStore(spark, root, "spark crawl frontier", "content", 10)
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

    // D1 URL-seen dedup: candidate urls minus seen urls
    // (gcloud_master.py:320-338). r6 (guide §2.4, remove shuffles
    // outright): both join inputs derive from the SAME table, so the
    // anti-join folds into the final aggregation — ONE scan of events and
    // ONE exchange of partial aggregates replace two scans, the seen-side
    // distinct exchange and the anti-join exchange pair. Equivalence: the
    // anti-join kept every click row whose page_id had zero view rows,
    // then counted clicks per page_id — i.e. per page_id over click∪view
    // rows, n = count(clicks) emitted iff no view row exists. (The engine
    // operator this query value-checks — the LSM seen anti-join — joins
    // DISTINCT tables and keeps its shape; q_anti_join still exercises the
    // two-table anti-join plan.)
    "q_seen_dedup" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .where(col("event_type") === "click" || col("event_type") === "view")
        .select((col("event_id") * 13 % 2000).as("page_id"), col("event_type"))
        .groupBy("page_id")
        .agg(count(when(col("event_type") === "click", 1)).as("n"),
          max(when(col("event_type") === "view", 1)).as("has_view"))
        .where(col("has_view").isNull && col("n") > 0)
        .select("page_id", "n")
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
    // (gcloud_indexer.py:37-101). r6: the query-term list is a FIXED tiny
    // set, so the per-doc score folds into one projection — the former
    // crossJoin (3 rows/doc through a BroadcastNestedLoopJoin) + groupBy
    // (one exchange) + sum collapse to scan → project → filter →
    // TakeOrdered with zero exchanges. Same result exactly: the summed
    // weights are small integers in double, associative in fp; a doc
    // appears iff ≥ 1 term hits.
    "q_search_scoring" -> ((s, dir) => {
      val terms = Seq("spark", "data", "query")
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), gf.tokenize(col("text")).as("ts"))
        .withColumn("title_ts", slice(col("ts"), 1, 5))
      val ws = terms.map(tm =>
        when(array_contains(col("title_ts"), tm), lit(2.0))
          .when(array_contains(col("ts"), tm), lit(1.0)))
      d.where(ws.map(_.isNotNull).reduce(_ || _))
        .select(col("doc_id"), ws.map(w => coalesce(w, lit(0.0))).reduce(_ + _).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(10)
    }),

    // T8/S9 inverted-index build as a value-checked query: postings with
    // title weight 2.0 / body 1.0, title-wins per (term, doc)
    // (gcloud_indexer.py:56-62) over a first-5-token pseudo-title
    // r6: one scan, one explode of the per-doc DISTINCT term set, weight by
    // title membership — replaces the two-branch union (scan+tokenize ×2,
    // explode of EVERY token occurrence) and the (term, doc_id) groupBy
    // exchange. Equivalence: the union's max(weight) per (term, doc_id) is
    // 2.0 iff the term occurs among the first 5 tokens (title_ts ⊆ ts) and
    // 1.0 otherwise, over exactly the distinct (term, doc) pairs —
    // precisely explode(array_distinct(ts)) with an array_contains(title)
    // weight. Zero exchanges.
    "q_postings" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), gf.tokenize(col("text")).as("ts"))
        .select(col("doc_id"), slice(col("ts"), 1, 5).as("title_ts"),
          explode(array_distinct(col("ts"))).as("term"))
        .select(col("term"), col("doc_id"),
          when(array_contains(col("title_ts"), col("term")), lit(2.0))
            .otherwise(lit(1.0)).as("weight"))
    }),

    // A4 remainder — index-size stats (the reference indexer's heartbeat
    // reports len(url_index)/len(content_index), gcloud_indexer.py:566-573):
    // exact distinct terms / indexed docs / posting rows over the same
    // postings build as q_postings. (The engine-side equivalents:
    // Crawler.indexStats exact-on-demand, per-round approx deltas in the
    // round manifests via indexStatsHistory.)
    // r6: same restructure as q_postings — the (term, doc_id) groupBy that
    // only deduplicated per-doc occurrences is replaced by
    // explode(array_distinct(ts)) (title terms are a subset of ts, so the
    // distinct pair set is identical), feeding the same final aggregate.
    // One scan + one exchange-free explode instead of two scans, two
    // explodes and a full (term, doc_id) shuffle.
    "q_index_stats" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), explode(array_distinct(gf.tokenize(col("text")))).as("term"))
        .agg(countDistinct(col("term")).as("distinct_terms"),
          countDistinct(col("doc_id")).as("indexed_docs"),
          count(lit(1)).as("postings_rows"))
    }),

    // J2 title-field search: postings whose term is in the title token set
    // only (gcloud_indexer.py:83-84), weighted sum, top-10
    // r6: fixed term set → fold the per-doc title score into one projection
    // (score = 2.0 · matched-term count; sum(lit(2.0)) over n matching
    // crossJoin rows is exactly 2.0·n), and tokenize stops after the 5
    // title tokens (tokenize_prefix ≡ slice(tokenize, 1, 5) — the rest of
    // the document is never needed). Zero joins, zero exchanges,
    // TakeOrdered top-k.
    "q_search_title" -> ((s, dir) => {
      val terms = Seq("spark", "data", "query")
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), gf.tokenize_prefix(col("text"), 5).as("title_ts"))
      val hits = terms.map(tm =>
        when(array_contains(col("title_ts"), tm), 1).otherwise(0)).reduce(_ + _)
      d.where(hits > 0)
        .select(col("doc_id"), (hits * lit(2.0)).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(10)
    }),

    // J2 url-field search: 1.0 per query term that is a substring of the
    // url, over ALL indexed urls (gcloud_indexer.py:76-81)
    // r6: fixed term set → per-url score in one projection (score = 1.0 ·
    // matched-term count ≡ sum(lit(1.0)) over matching crossJoin rows;
    // urls are unique per doc, so the groupBy only ever summed one url's
    // rows). Zero joins, zero exchanges, TakeOrdered top-k.
    "q_search_url" -> ((s, dir) => {
      val terms = Seq("src1", "d/4", "example")
      val d = s.read.parquet(t(dir, "documents"))
        .select(concat(lit("https://"), col("source"),
          lit(".example.test/d/"), col("doc_id")).as("url"))
      val hits = terms.map(tm =>
        when(col("url").contains(tm), 1).otherwise(0)).reduce(_ + _)
      d.where(hits > 0)
        .select(col("url"), (hits * lit(1.0)).as("score"))
        .orderBy(desc("score"), asc("url"))
        .limit(10)
    }),

    // F2 domain validation (cli.py:18-21): the reference's domain regex
    // over synthesized well- and mal-formed candidates
    "q_domain_valid" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .select(col("event_id"), col("user_id"), (col("event_id") % 5).as("form"))
        .withColumn("domain",
          when(col("form") === 0, concat(lit("h-"), col("user_id"), lit(".example.test")))
            .when(col("form") === 1, lit("bad_domain"))
            .when(col("form") === 2, lit("x.t"))
            .when(col("form") === 3, lit("-bad.example.test"))
            .otherwise(concat(lit("sub.domain-"), col("user_id"), lit(".co"))))
      ev.select(col("event_id"), col("domain"),
        col("domain").rlike(graft.functions.UrlKit.DomainRegex).as("valid"))
    }),

    // S13 full form: parse timestamps out of raw log lines in the
    // reference's two formats, filter ts > since, tail 200
    // (templates/app.py:1070-1140)
    "q_log_parse" -> ((s, dir) => {
      val lines = s.read.parquet(t(dir, "events"))
        .select(col("event_id"), col("ts"), (col("event_id") % 3).as("form"))
        .select(when(col("form") === 0,
          concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            lit(",123 - Master - INFO - evt "), col("event_id")))
          .when(col("form") === 1,
            concat(lit("["), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              lit("] crawler msg "), col("event_id")))
          .otherwise(concat(lit("no timestamp line "), col("event_id"))).as("line"))
      operators.LogParse.parse(lines, "line", sinceEpoch = 1705276800L, limit = 200)
    }),

    // C10 full form: 429 backoff with deterministic jitter in [1, 5)
    // (gcloud_crawler.py:364-367; the reference's random.uniform(1,5) is
    // replaced by a seeded integer-hash uniform so runs are reproducible)
    "q_backoff_429" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .select(col("event_id"), (col("event_id") % 4).as("retry"),
          (col("event_id") % 100 < 7).as("is_429"))
        .withColumn("delay_s",
          lit(2.0) * pow(lit(2.0), col("retry")) +
            when(col("is_429"),
              lit(1.0) + lit(4.0) *
                ((col("event_id") * 2654435761L) % 1000).cast("double") / lit(1000.0))
              .otherwise(lit(0.0)))
    }),

    // C8 snippet: first 200 chars + '...' (gcloud_indexer.py:340)
    "q_snippet" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 200), lit("...")).as("snippet"))
    }),

    // C8 variant: query-centered snippet window (templates/app.py:675-694)
    "q_snippet_centered" -> ((s, dir) => {
      val pos = locate("data", col("text"))
      s.read.parquet(t(dir, "documents"))
        .where(pos > 0)
        .select(col("doc_id"),
          col("text").substr(greatest(pos - 20, lit(1)), lit(60)).as("ctx"))
    }),

    // J6 url → stored-page point lookup (templates/app.py:807-904): exact
    // key predicate reaches the scan (PlanAuditSpec checks pushdown class)
    "q_point_lookup" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .where(col("doc_id") === 42)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // exact dedup over documents: first doc_id wins per identical text
    // (training-data op; same shape as D1 at content level). r6: the text
    // column is dropped from the output, so the groupBy key is the 128-bit
    // md5 of the text instead of the text itself — the shuffle carries a
    // fixed 32-byte key per distinct (text, partition) rather than whole
    // documents (guide §2.3: shuffle keys, not payloads; at 10^10 docs the
    // 2^-129-per-pair md5 collision odds are far below fp noise, and md5
    // is already this engine's content-fingerprint primitive).
    "q_dedup_exact" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .groupBy(md5(col("text")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dupes"))
        .select("keep_id", "dupes")
    }),

    // document fingerprinting: md5 of whitespace-normalized lowercase text
    "q_fingerprint" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
    }),

    // ---- training-data curation ops (dedup / similarity / text) ----

    // exact all-pairs n-gram jaccard (brute baseline; oracle path).
    // Deterministically capped to doc_id < 500 — quadratic by design, so
    // the cost must not scale with sf (the LSH query below is the scale
    // path over the full table).
    "q_dedup_jaccard_pairs" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
        .where(col("doc_id") < 500 && size(gf.tokenize(col("text"))) >= 3)
      operators.Dedup.jaccardBrute(docs, "doc_id", "text", n = 3, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // MinHash+LSH near-dup detection, exact-verified: the scale path for
    // the same result set (bands×rows tuned so P(miss@0.5) < 1e-8)
    "q_dedup_minhash" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
        .where(size(gf.tokenize(col("text"))) >= 3)
      operators.Dedup.minhashLSH(docs, "doc_id", "text",
        n = 3, bands = 64, rows = 2, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
    }),

    // SimHash hamming ≤ 3 pairs via Manku block-combination tables (64-bit
    // custom expression — not SQL-expressible in the oracle; driver records
    // rows-only; exactness is pigeonhole-tested against brute force in
    // DedupSpec). Hamming 3 of 64 is the standard near-dup radius (Manku
    // WWW'07); the pre-r3 chunk-bucket form at hamming ≤ 6 went quadratic
    // on this self-similar corpus.
    "q_dedup_simhash" -> ((s, dir) => {
      operators.Dedup.simhashPairs(
        s.read.parquet(t(dir, "documents")), "doc_id", "text",
        maxHamming = 3, blocks = 6)
    }),

    // embedding near-dup pairs: LSH bucket + exact cosine ≥ 0.95. The raw
    // fixture has no near-dups (max pair cos ≈ 0.6), which would make the
    // oracle row vacuous (0 == 0) — so the query deterministically injects
    // scaled copies (vec_id + 1e6, embedding × 2) of the first 20 vectors.
    // A scaled copy has the SAME random-hyperplane signs as its source, so
    // the single-table LSH bucket join finds every injected pair with
    // probability 1 (not just high probability), keeping the result exact.
    "q_embedding_dupes" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings")).select("vec_id", "embedding")
      val copies = emb.where(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      operators.Dedup.embeddingDupes(
        emb.unionByName(copies), "vec_id", "embedding",
        threshold = 0.95, bits = 8)
        .withColumn("cos", round(col("cos"), 6))
    }),

    // brute-force cosine ANN top-5 for the first 3 vectors as queries
    "q_ann_brute" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      val queries = emb.orderBy("vec_id").limit(3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      operators.Similarity.bruteTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5)
        .withColumn("cos", round(col("cos"), 6))
    }),

    // IVF-pruned ANN (scale path; recall-tunable — rows-only check, the
    // exact brute result is the oracle-checked query above)
    "q_ann_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      val queries = emb.orderBy("vec_id").limit(3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      operators.Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 5, nCells = 16, nProbe = 6)
        .withColumn("cos", round(col("cos"), 6))
    }),

    // language-ID by stopword-marker argmax
    "q_lang_id" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), operators.TextAnalysis.langId(col("text")).as("lang_pred"))
    }),

    // composite quality score
    "q_quality_score" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          operators.TextAnalysis.qualityScore(col("text")).as("quality"))
    }),

    // token counting (words + BPE-ish subword estimate)
    "q_token_counts" -> ((s, dir) => {
      operators.TextAnalysis.tokenCounts(
        s.read.parquet(t(dir, "documents")), "doc_id", "text")
    }),

    // order-sensitive rolling-hash fingerprint (xxhash64 chain — not
    // expressible in the DuckDB oracle; rows-only)
    "q_rolling_fingerprint" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          operators.TextAnalysis.rollingFingerprint(col("text")).as("rfp"))
    }),

    // Adler-32-style rolling fingerprint over token values: the
    // oracle-checkable member of the fingerprint family (rsync/zlib
    // checksum structure, arithmetic both engines share bit-for-bit)
    "q_rolling_fingerprint_sql" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          operators.TextAnalysis.adlerFingerprint(col("text")).as("rfp"))
    }),

    // the Manku simhash bucket machinery (table keys, pigeonhole bucket
    // join, first-clean-table dedup) oracle-checked against a brute-force
    // hamming join: fingerprints are synthesized DETERMINISTICALLY from
    // doc_id with arithmetic both engines share, near-dup pairs injected
    // at hamming 3 (kept) and hamming 4 (a must-be-excluded control)
    "q_dedup_simhash_sql" -> ((s, dir) => {
      val base = s.read.parquet(t(dir, "documents")).select(col("doc_id"))
        .withColumn("fp",
          (col("doc_id") * lit(2654435761L)) % lit(4294967296L) +
            ((col("doc_id") * lit(40503L) + lit(12345L)) % lit(1048576L)) *
              lit(4294967296L))
      val copies = base.where(col("doc_id") < 40)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          when(col("doc_id") % 2 === 0, col("fp").bitwiseXOR(lit(37L)))
            .otherwise(col("fp").bitwiseXOR(lit(15L))).as("fp"))
      operators.Dedup.simhashPairsFromFp(
        base.unionByName(copies)
          .select(col("doc_id").as("doc"), col("fp").as("sim")),
        maxHamming = 3, blocks = 6)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }),

    // multimodal pipeline over REAL media: deterministic PNG / WAV /
    // MJPEG-AVI bytes synthesized per doc (round-robin by id), then
    // genuinely decoded (javax.imageio headers / RIFF parse for both WAV
    // and AVI), images resized through Graphics2D, audio duration from the
    // PCM frame count, video frames sampled and JPEG-decoded. rows-only
    // for the driver (DuckDB has no codecs); value-level goldens live in
    // MultimodalSpec (decode(resize(x)) dims, histograms, PCM samples,
    // per-frame decode goldens).
    "q_media_pipeline" -> ((s, dir) => {
      val base = s.read.parquet(t(dir, "documents")).select("doc_id")
      val withMedia = operators.Multimodal.syntheticMedia3(base, "doc_id")
      val img = operators.Multimodal.resizeImage(
        operators.Multimodal.imageMeta(withMedia, "media"), "media", 24)
      val av = operators.Multimodal.videoFrameSample(
        operators.Multimodal.videoMeta(
          operators.Multimodal.audioMeta(img, "media"), "media"),
        "media", everyK = 2)
      av.select(col("doc_id"),
        coalesce(col("meta.format"), col("audio_meta.format"),
          col("video_meta.format")).as("format"),
        coalesce(col("resized.width"), col("video_meta.width")).as("width"),
        coalesce(col("resized.height"), col("video_meta.height")).as("height"),
        coalesce(col("audio_meta.duration_ms"), col("video_meta.duration_ms"))
          .as("duration_ms"),
        coalesce(col("video_meta.n_frames"), lit(0L)).as("n_frames"),
        coalesce(size(col("frames")), lit(0)).cast("long").as("frames_sampled"),
        length(col("media")).cast("long").as("n_bytes"))
    }),

    // ---- relational coverage (SURVEY §2.3/2.5 join family) ----

    // J1-style broadcast equi-join + agg: revenue per nation
    "q_join_agg" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      val n = s.read.parquet(t(dir, "nation"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // J7 semi-join: customers with at least one high-value order
    "q_semi_join" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
        .where(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // D1-as-anti-join: parts never shipped in bulk (quantity > 45)
    "q_anti_join" -> ((s, dir) => {
      val p = s.read.parquet(t(dir, "part"))
      val l = s.read.parquet(t(dir, "lineitem")).where(col("l_quantity") > 45)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    }),

    // D3 EXCEPT: building-segment customers minus high-balance ones
    "q_except" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .except(c.where(col("c_acctbal") > 5000.0).select("c_custkey"))
    }),

    // D4 UNION + dedup: retry-failed style re-queue merge. r6: the two
    // branches scan the SAME table, so union-of-filters ≡ one scan with the
    // disjunction — half the scan work, one codegen pipeline, identical
    // distinct key set (a row in both branches contributes the same key).
    "q_union_dedup" -> ((s, dir) => {
      s.read.parquet(t(dir, "orders"))
        .where(col("o_orderstatus") === "F" || col("o_orderpriority") === "1-URGENT")
        .select("o_custkey")
        .distinct()
    }),

    // J3 substring theta join: term list against document text
    "q_theta_join" -> ((s, dir) => {
      import s.implicits._
      val terms = Seq("spark", "window", "cuckoo").toDF("term")
      s.read.parquet(t(dir, "documents"))
        .join(broadcast(terms), col("text").contains(col("term")))
        .groupBy("term").agg(count(lit(1)).as("n_docs"))
    }),

    // C10 retry backoff ladder: delay = 2·2^retry
    "q_backoff" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .select(col("event_id"), (col("event_id") % 4).as("retry"))
        .withColumn("delay_s", lit(2.0) * pow(lit(2.0), col("retry")))
    }),

    // F3/F4/U2 link hygiene + canonicalization over synthesized messy hrefs
    "q_url_hygiene" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .select(col("event_id"),
          concat(lit("https://h-"), col("user_id") % 10,
            lit(".example.test/p/"), col("user_id")).as("base"),
          (col("event_id") % 6).as("form"))
        .withColumn("href",
          when(col("form") === 0, concat(lit("https://other.test/x/"), col("event_id")))
            .when(col("form") === 1, concat(lit("/rel/"), col("event_id")))
            .when(col("form") === 2, concat(lit("sub/"), col("event_id")))
            .when(col("form") === 3, lit("#frag"))
            .when(col("form") === 4, lit("javascript:void(0)"))
            .otherwise(concat(lit("?q="), col("event_id"))))
      ev.select(col("event_id"),
        gf.url_canonicalize(col("base"), col("href")).as("canon"))
        .where(col("canon").isNotNull)
    }),

    // T-pattern tumbling-window aggregation (streaming batch-equivalent)
    "q_window_agg" -> ((s, dir) => {
      s.read.parquet(t(dir, "events"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("value_milli"))
    }),

    // O3 recent-activity: last 3 events per user
    "q_recent_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
      s.read.parquet(t(dir, "events"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("user_id", "rn", "event_id", "event_type")
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

  /** Brute-force exact word-3gram Jaccard pairs ≥ 0.5 — shared by the
   * brute query and (as ground truth) the LSH query. */
  private def jaccardPairsSqlFor(where: String): String =
    s"""WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
      |                             x -> x != '') AS ts
      |  FROM documents$where
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ts)-2),
      |         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
      |  FROM toks WHERE len(ts) >= 3
      |)
      |SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.s, b.s))::DOUBLE
      |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |) WHERE j >= 0.5""".stripMargin

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
    "q_postings" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                             x -> x != '') AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, ts, ts[1:5] AS title_ts FROM toks
        |), p AS (
        |  SELECT doc_id, unnest(title_ts) AS term, 2.0 AS w FROM d
        |  UNION ALL
        |  SELECT doc_id, unnest(ts) AS term, 1.0 AS w FROM d
        |)
        |SELECT term, doc_id, CAST(MAX(w) AS DOUBLE) AS weight
        |FROM p GROUP BY term, doc_id""".stripMargin,
    "q_index_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                             x -> x != '') AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, ts, ts[1:5] AS title_ts FROM toks
        |), p AS (
        |  SELECT doc_id, unnest(title_ts) AS term FROM d
        |  UNION ALL
        |  SELECT doc_id, unnest(ts) AS term FROM d
        |), post AS (
        |  SELECT term, doc_id FROM p GROUP BY term, doc_id
        |)
        |SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS distinct_terms,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS indexed_docs,
        |       CAST(COUNT(*) AS BIGINT) AS postings_rows
        |FROM post""".stripMargin,
    "q_search_title" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                             x -> x != '') AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, ts[1:5] AS title_ts FROM toks
        |), terms(term) AS (VALUES ('spark'), ('data'), ('query'))
        |SELECT doc_id, CAST(SUM(2.0) AS DOUBLE) AS score
        |FROM d CROSS JOIN terms t
        |WHERE list_contains(d.title_ts, t.term)
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q_search_url" ->
      """WITH d AS (
        |  SELECT 'https://' || source || '.example.test/d/' || doc_id AS url
        |  FROM documents
        |), terms(term) AS (VALUES ('src1'), ('d/4'), ('example'))
        |SELECT url, CAST(SUM(1.0) AS DOUBLE) AS score
        |FROM d CROSS JOIN terms t
        |WHERE contains(url, term)
        |GROUP BY url ORDER BY score DESC, url LIMIT 10""".stripMargin,
    "q_domain_valid" ->
      """SELECT event_id,
        |  CASE
        |    WHEN event_id % 5 = 0 THEN 'h-' || user_id || '.example.test'
        |    WHEN event_id % 5 = 1 THEN 'bad_domain'
        |    WHEN event_id % 5 = 2 THEN 'x.t'
        |    WHEN event_id % 5 = 3 THEN '-bad.example.test'
        |    ELSE 'sub.domain-' || user_id || '.co'
        |  END AS domain,
        |  regexp_matches(
        |    CASE
        |      WHEN event_id % 5 = 0 THEN 'h-' || user_id || '.example.test'
        |      WHEN event_id % 5 = 1 THEN 'bad_domain'
        |      WHEN event_id % 5 = 2 THEN 'x.t'
        |      WHEN event_id % 5 = 3 THEN '-bad.example.test'
        |      ELSE 'sub.domain-' || user_id || '.co'
        |    END,
        |    '^([a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?\.)+[a-zA-Z]{2,}$') AS valid
        |FROM events""".stripMargin,
    "q_log_parse" ->
      """WITH lines AS (
        |  SELECT CASE
        |    WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |      || ',123 - Master - INFO - evt ' || event_id
        |    WHEN event_id % 3 = 1 THEN '[' || strftime(ts, '%Y-%m-%d %H:%M:%S')
        |      || '] crawler msg ' || event_id
        |    ELSE 'no timestamp line ' || event_id
        |  END AS line
        |  FROM events
        |), parsed AS (
        |  SELECT line,
        |    CASE
        |      WHEN regexp_extract(line, '(\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}:\d{2})', 1) != ''
        |        THEN regexp_extract(line, '(\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}:\d{2})', 1)
        |      WHEN regexp_extract(line, '\[([\d-]+\s+[\d:]+)\]', 1) != ''
        |        THEN regexp_extract(line, '\[([\d-]+\s+[\d:]+)\]', 1)
        |    END AS ts_str
        |  FROM lines
        |)
        |SELECT CAST(epoch(strptime(ts_str, '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS epoch, line
        |FROM parsed
        |WHERE ts_str IS NOT NULL
        |  AND CAST(epoch(strptime(ts_str, '%Y-%m-%d %H:%M:%S')) AS BIGINT) > 1705276800
        |ORDER BY epoch DESC, line DESC LIMIT 200""".stripMargin,
    "q_backoff_429" ->
      """SELECT event_id, event_id % 4 AS retry, (event_id % 100 < 7) AS is_429,
        |  CAST(2.0 AS DOUBLE) * pow(CAST(2.0 AS DOUBLE), event_id % 4) +
        |  CASE WHEN event_id % 100 < 7
        |    THEN 1.0 + 4.0 * CAST((event_id * 2654435761) % 1000 AS DOUBLE) / 1000.0
        |    ELSE 0.0 END AS delay_s
        |FROM events""".stripMargin,
    "q_snippet" ->
      "SELECT doc_id, substr(text, 1, 200) || '...' AS snippet FROM documents",
    "q_snippet_centered" ->
      """SELECT doc_id,
        |  substr(text, greatest(strpos(text, 'data') - 20, 1), 60) AS ctx
        |FROM documents WHERE strpos(text, 'data') > 0""".stripMargin,
    "q_point_lookup" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id = 42",
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dupes
        |FROM documents GROUP BY text""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "q_rolling_fingerprint_sql" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                             x -> x != '') AS ts
        |  FROM documents
        |), vals AS (
        |  SELECT doc_id, len(ts)::BIGINT AS n,
        |    list_transform(ts, t -> (ascii(t) + 131 * length(t)
        |      + 7 * ascii(substr(t, length(t), 1)))::BIGINT) AS vs
        |  FROM toks
        |)
        |SELECT doc_id,
        |  CAST(((n + coalesce(list_sum(list_transform(generate_series(1, n),
        |          i -> (n - i + 1) * vs[i])), 0)) % 65521) * 65536
        |    + ((1 + coalesce(list_sum(vs), 0)) % 65521) AS BIGINT) AS rfp
        |FROM vals""".stripMargin,
    "q_dedup_simhash_sql" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    (doc_id * 2654435761) % 4294967296
        |      + ((doc_id * 40503 + 12345) % 1048576) * 4294967296 AS fp
        |  FROM documents
        |), allv AS (
        |  SELECT doc_id, fp FROM base
        |  UNION ALL
        |  SELECT doc_id + 10000000,
        |    CASE WHEN doc_id % 2 = 0 THEN xor(fp, 37) ELSE xor(fp, 15) END
        |  FROM base WHERE doc_id < 40
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM allv a JOIN allv b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin,
    "q_dedup_jaccard_pairs" -> jaccardPairsSqlFor(" WHERE doc_id < 500"),
    // the LSH path is exact-verified and tuned for P(miss) < 1e-8 at the
    // threshold, so its oracle is the same brute-force pair set
    "q_dedup_minhash" -> jaccardPairsSqlFor(""),
    "q_embedding_dupes" ->
      """WITH all_v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, list_transform(embedding, x -> x * 2.0::FLOAT)
        |  FROM embeddings WHERE vec_id < 20
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95""".stripMargin,
    "q_ann_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |         list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS c
        |  FROM embeddings e CROSS JOIN q
        |), ranked AS (
        |  SELECT qid, vec_id, c,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rank
        |  FROM scored
        |)
        |SELECT qid, rank, vec_id, round(c, 6) AS cos FROM ranked WHERE rank <= 5""".stripMargin,
    "q_lang_id" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                             x -> x != '') AS ts
        |  FROM documents
        |), hits AS (
        |  SELECT doc_id, 'de' AS lang, len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','mit','ein'))) AS h FROM toks
        |  UNION ALL SELECT doc_id, 'en', len(list_filter(ts, x -> x IN ('the','and','of','to','is','in','that','it'))) FROM toks
        |  UNION ALL SELECT doc_id, 'es', len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','del'))) FROM toks
        |  UNION ALL SELECT doc_id, 'fr', len(list_filter(ts, x -> x IN ('le','la','et','les','des','un','une','est'))) FROM toks
        |  UNION ALL SELECT doc_id, 'zh', len(list_filter(ts, x -> x IN ('de5','shi4','le5','zai4','you3','wo3','ta1','men5'))) FROM toks
        |), ranked AS (
        |  SELECT doc_id, lang, h,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
        |  FROM hits
        |)
        |SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'und' END AS lang_pred
        |FROM ranked WHERE rn = 1""".stripMargin,
    "q_quality_score" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                     x -> x != '') AS ts
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    len(ts)::DOUBLE AS ntok,
        |    length(text)::DOUBLE AS nchars,
        |    (length(text)::DOUBLE - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) / length(text)::DOUBLE AS punct,
        |    len(list_filter(ts, x -> x IN ('the','and','of','to','is','in','that','it')))::DOUBLE / len(ts) AS stop,
        |    len(list_distinct(ts))::DOUBLE / len(ts) AS diversity
        |  FROM toks
        |)
        |SELECT doc_id,
        |  round(0.3::DOUBLE * least(ntok / 100.0, 1.0::DOUBLE)
        |      + 0.2::DOUBLE * (1.0::DOUBLE - least(punct * 5, 1.0::DOUBLE))
        |      + 0.2::DOUBLE * least(stop * 5, 1.0::DOUBLE)
        |      + 0.3::DOUBLE * diversity, 6) AS quality
        |FROM m""".stripMargin,
    "q_token_counts" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
        |                     x -> x != '') AS ts
        |  FROM documents
        |)
        |SELECT doc_id, len(ts)::BIGINT AS n_words,
        |  CAST(list_sum(list_transform(ts, t -> CAST(ceil(length(t)/4.0) AS BIGINT))) AS BIGINT) AS n_subword_est,
        |  length(text)::BIGINT AS n_chars_exact
        |FROM toks""".stripMargin,
    "q_join_agg" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)""".stripMargin,
    "q_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0""".stripMargin,
    "q_union_dedup" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q_theta_join" ->
      """SELECT term, COUNT(*) AS n_docs FROM documents
        |JOIN (VALUES ('spark'), ('window'), ('cuckoo')) AS t(term)
        |  ON contains(text, term)
        |GROUP BY term""".stripMargin,
    "q_backoff" ->
      """SELECT event_id, event_id % 4 AS retry,
        |  CAST(2.0 AS DOUBLE) * pow(CAST(2.0 AS DOUBLE), event_id % 4) AS delay_s
        |FROM events""".stripMargin,
    "q_url_hygiene" ->
      """SELECT event_id, CASE
        |  WHEN event_id % 6 = 0 THEN 'https://other.test/x/' || event_id
        |  WHEN event_id % 6 = 1 THEN 'https://h-' || (user_id % 10) || '.example.test/rel/' || event_id
        |  WHEN event_id % 6 = 2 THEN 'https://h-' || (user_id % 10) || '.example.test/p/sub/' || event_id
        |  WHEN event_id % 6 = 5 THEN 'https://h-' || (user_id % 10) || '.example.test/p/' || user_id || '?q=' || event_id
        |  END AS canon
        |FROM events WHERE event_id % 6 IN (0, 1, 2, 5)""".stripMargin,
    "q_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_recent_per_user" ->
      """SELECT user_id, rn, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,
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
