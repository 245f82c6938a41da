package graft.operators

import graft._
import graft.functions.gf
import graft.plans.SnapshotTable
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * The BSP crawl engine (SURVEY.md §3.1 collapsed into one per-round DAG):
 *
 *   frontier →(politeness window T4)→ dispatched
 *            →(robots gate J5, "fetch" = broadcast join vs docs S3/S4)→ results
 *            →(span extraction U1, link explode F3/U2)→ candidates
 *            →(depth gate F6, allowed-domains F5, seen anti-join D1/D2,
 *              per-host cap window F7)→ admitted
 *            → new frontier (+ timeout requeues T2/T3), committed as one
 *              snapshot per round (T6) with fetch_log lineage + counters.
 *
 * Replaces the reference's master/crawler/indexer processes + Pub/Sub +
 * Firestore (gcloud_master.py / gcloud_crawler.py / gcloud_indexer.py)
 * with a deterministic Dataset pipeline: every ordering is an explicit
 * sort over unique keys, never partition-iteration order, so the crawl
 * schedule and seen set are reproducible at any parallelism — that is the
 * correctness gate (BASELINE.md §B).
 *
 * Scale design (10^10-URL frontier design point):
 *  - frontier/seen live ONLY in tables; nothing crawl-sized is collected
 *    to the driver (per-round counts are the only driver-side values).
 *  - the per-round "fetch" broadcasts the (politeness-bounded, thus small)
 *    dispatched set against the docs table — the 100 TB side is streamed,
 *    never shuffled; on a bucketed docs table the probe prunes to buckets.
 *  - seen-dedup is a left-anti join keyed by url, pre-filtered by a
 *    broadcast Bloom sketch once `seen` is large (D1): bloom-negative
 *    candidates skip the join entirely; positives are exactly re-checked,
 *    so false positives never drop URLs.
 *  - per-host politeness and caps are rank windows partitioned by host —
 *    the only per-host serialization the problem truly requires. Hot-host
 *    skew (the reference's own field data: one host held 421/738 pages) is
 *    defused by SALTED TWO-PHASE windows: phase 1 ranks within
 *    (host, salt = xxhash64(url) % S) buckets — S-way parallel even for a
 *    host holding half the frontier — and keeps only ranks ≤ the per-host
 *    budget/cap, so phase 2's true per-host window sees ≤ S·budget rows
 *    per host instead of the host's whole backlog.
 *  - intra-batch URL dedup is a min(struct(order…)) hash aggregation, not
 *    a per-URL window: partial aggregation combines duplicates map-side,
 *    so a URL every page links to (a homepage) never concentrates rows
 *    into one task.
 *
 * Fault model: the eager local checkpoints inside a round are TRANSIENT
 * per-round state (they cap recompute of multiply-consumed intermediates,
 * not durability). Durability is the round snapshot: every round commits
 * atomically, so on any executor/driver loss the crawl resumes EXACTLY
 * from the last committed round (resume-equivalence is spec-enforced) —
 * recompute is bounded by one round, which is the intended unit of retry
 * on a real cluster.
 */
object Crawler {

  /** Salt fan-out for the two-phase per-host windows. */
  val SaltBuckets = 16

  // Append-table schemas, for schema-correct empty reads of tables no
  // round has written yet (a crawl whose every seed 404'd creates no
  // pages/postings/doc_store directories at all — a legitimate state the
  // read projections must serve, not an error).
  private[operators] val PostingsDdl =
    "term string, url string, weight double, title string, round int"
  private[operators] val DocStoreDdl = "round int, url string, title string, text string"
  private val PagesDdl =
    "round int, url string, host string, raw string, content_type string"
  private val FetchLogDdl = "round int, url string, host string, depth int, " +
    "seq bigint, status string, part_id int, error string, links_found int"
  private val WorkerStatsDdl =
    "round int, part_id int, processed bigint, completed bigint, links_found bigint"

  case class RoundStats(
      round: Int, dispatched: Long, completed: Long, failed: Long,
      requeued: Long, admitted: Long, frontierSize: Long, seenSize: Long)

  case class CrawlSummary(rounds: Int, stats: Seq[RoundStats])

  // ---- column helpers -----------------------------------------------------

  /** allowed_domains predicate (F5, gcloud_master.py:50-59): blank list ⇒
   * allow all; else exact or dot-suffix match on the lowercased host. */
  def domainAllowed(host: Column, cfg: CrawlConfig): Column = {
    val allowed = cfg.effectiveAllowed
    if (allowed.isEmpty) lit(true)
    else allowed.map(d => host === lit(d) || host.endsWith(lit("." + d)))
      .reduce(_ || _)
  }

  /** Deterministic dense sequence assignment (seq = base + global rank in
   * the given total order), SAMPLING-FREE. Decomposes the global rank as
   * offset(group) + rank-within-group over an ORDER-ALIGNED group key
   * derived arithmetically from the order columns' min/max (one light
   * aggregation — the call's only driver-synchronous job): group
   * g = scaled bucket of the leading order column, nesting into later
   * columns when the leading span is narrow. g is a weakly-monotone pure
   * function of the order tuple, so groups are contiguous slices of the
   * total order; per-group counts → cumulative offsets (a P-row
   * single-partition window, built lazily as the broadcast side) and a
   * per-group rank window finish the job. Replaces the previous
   * range-partitioner scheme, whose per-call fixed cost — a sampling pass
   * over the input, an eager checkpoint of the full rows to pin sampled
   * boundaries, and a per-partition count collect — was a measured
   * scaling bottleneck at low core counts (BENCH.md): three
   * driver-synchronous jobs and one full materialization become one tiny
   * agg. The result depends only on VALUES (bounds, counts, order), never
   * on partition boundaries, so the seq is reproducible at any
   * parallelism without pinning anything.
   *
   * Preconditions (all engine call sites satisfy them): order columns are
   * non-null and integral-castable, and together form a total order.
   * Group-size balance tracks the value distribution inside [min, max] —
   * uniform-ish for every engine caller (seed indices, parent seqs of a
   * dispatched window, candidate ids); a pathological distribution costs
   * one oversized sort group, never correctness. */
  def assignSeq(spark: SparkSession, df: DataFrame, order: Seq[Column],
                base: Long): DataFrame = {
    val n = order.length
    val bounds = df.agg(count(lit(1)).as("_n"),
      order.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(c).cast(LongType).as(s"_lo$i"), max(c).cast(LongType).as(s"_hi$i"))
      }: _*).collect()(0)
    if (bounds.getLong(0) == 0L) return df.withColumn("seq", lit(0L)).limit(0)
    val los = (0 until n).map(i => bounds.getLong(1 + 2 * i))
    val his = (0 until n).map(i => bounds.getLong(2 + 2 * i))
    val targetGroups = math.max(
      scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
        .getOrElse(spark.sparkContext.defaultParallelism), 2).toLong

    // order-aligned group key: bucket the leading column's [lo, hi] span;
    // when the span is narrower than the group budget (constant bucket
    // column, seed ord1 = -1, tiny crawls) give each leading value its own
    // sub-range and recurse into the next column. Weak monotonicity in the
    // order tuple is the invariant (floor of a monotone map stays
    // monotone; nested terms are bounded by their sub-budget up to the
    // boundary-rounding row, which only ever merges ADJACENT slices) —
    // exact bucket-boundary placement is free to wobble, alignment is not.
    def groupKey(i: Int, budget: Long): Column = {
      if (i >= n || budget <= 1) lit(0L)
      else {
        val span = his(i) - los(i) + 1 // >= 1; engine key spans fit long
        val c = order(i).cast(LongType) - lit(los(i))
        if (span >= budget) {
          val width = math.max(1L, (span + budget - 1) / budget)
          floor(c.cast("double") / lit(width.toDouble)).cast(LongType)
        } else {
          val inner = math.max(1L, budget / span)
          c * lit(inner) + groupKey(i + 1, inner)
        }
      }
    }

    val withG = df.withColumn("_g", groupKey(0, targetGroups))
    // per-group offsets: counts → exclusive running sum over the (≤ P-row)
    // group table. Built LAZILY as the broadcast build side — it executes
    // as a sub-job of the consumer's action, not a driver round trip.
    val offW = Window.orderBy(col("_g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withG.groupBy(col("_g")).agg(count(lit(1)).as("_cnt"))
      .coalesce(1) // P rows; single partition makes the running sum exact + quiet
      .withColumn("_off", coalesce(sum(col("_cnt")).over(offW), lit(0L)))
      .drop("_cnt")
    val rankW = Window.partitionBy(col("_g")).orderBy(order: _*)
    withG.withColumn("_r", row_number().over(rankW))
      .join(broadcast(offsets), Seq("_g"))
      .withColumn("seq", lit(base) + col("_off") + col("_r"))
      .drop("_g", "_off", "_r")
  }

  /** Fold a seen-set increment (or the whole set) into its JOIN-OPTIMAL
   * physical form: hash-partitioned by url at the session's shuffle
   * partitioning, sorted within partitions, checkpointed. Spark 4's
   * `localCheckpoint` captures the physical plan's partitioning and
   * ordering into the resulting `LogicalRDD`, so [[admit]]'s anti-join
   * right side then satisfies its distribution AND ordering requirements
   * for free — the 10^10-row seen set of a 100 TB crawl is never
   * re-shuffled or re-sorted per round. run() maintains seen this way as
   * an LSM: per-round admitted urls fold into O(admitted)-cost delta
   * tiers, and the base refolds only when the deltas grow to a fraction
   * of it (amortized O(1) shuffled rows per admitted url). */
  def foldSeen(df: DataFrame): DataFrame = {
    // EXPLICIT partition count: a bare repartition(col) is
    // REPARTITION_BY_COL, which AQE may coalesce — the checkpoint would
    // then capture a partition count that no longer matches the
    // admission side's shuffle and the join re-exchanges the tier,
    // silently un-doing this whole optimization. The pinned count matches
    // the session's shuffle partitioning, which is what the candidate
    // side's ENSURE_REQUIREMENTS exchange produces.
    val n = scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    // AQE off around the eager checkpoint: when the fold executes through
    // AdaptiveSparkPlanExec, Spark 4's checkpoint records
    // UnknownPartitioning instead of the final hashpartitioning(url, n)
    // (measured — the join then re-exchanges every tier). The fold is one
    // fixed-width shuffle; AQE has nothing to re-plan in it anyway.
    val sess = df.sparkSession
    val prevAqe = sess.conf.get("spark.sql.adaptive.enabled")
    try {
      sess.conf.set("spark.sql.adaptive.enabled", "false")
      df.repartition(n, col("url")).sortWithinPartitions("url").localCheckpoint(true)
    } finally sess.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  // ---- admission gate (shared by seeds and extracted links) ---------------

  /**
   * The reference's add_urls_to_queue loop (gcloud_master.py:320-338),
   * re-expressed set-at-a-time. Candidates carry a unique canonical order
   * (ord1, ord2) = (parent_seq, link_pos); semantics per candidate IN ORDER:
   * skip if seen (D1) or duplicated earlier in batch (D2); skip if domain
   * not allowed (F5); skip if the host's enqueue-count reached the cap —
   * cap-rejected URLs are NOT marked seen and may be re-proposed later
   * (F7 quirk, counted at enqueue time).
   *
   * Set-at-a-time equivalence holds because the per-host count is
   * monotonic: a candidate is admitted iff prior_count(host) + its rank
   * among admitted-eligible batch candidates of that host ≤ cap.
   */
  def admit(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
            hostCounts: DataFrame, cfg: CrawlConfig,
            seenSketch: Option[graft.functions.SeenSketch],
            seenDeltas: Seq[DataFrame] = Nil): DataFrame = {
    // intra-batch first-occurrence wins (D2) — deterministic via min over
    // the (ord1, ord2) total order. A hash aggregation (NOT a per-URL
    // window): duplicates of a hot URL combine map-side before the shuffle.
    val firstOnly = candidates
      .groupBy(col("url"))
      .agg(min(struct(col("ord1"), col("ord2"), col("host"),
        col("depth"), col("retry"))).as("m"))
      .select(col("url"), col("m.host").as("host"), col("m.depth").as("depth"),
        col("m.retry").as("retry"), col("m.ord1").as("ord1"), col("m.ord2").as("ord2"))

    // seen anti-join (D1), sketch-prefiltered when available: sketch-negative
    // candidates skip the join entirely; positives are exactly re-checked,
    // so filter false positives never drop URLs. The probe is a native
    // codegen expression (SketchContains), and the plan is deliberately
    // left BARRIER-FREE: Catalyst pushes the (deterministic) probe filter
    // below the dedup aggregation, so each union branch builds its own
    // exchange over a DISJOINT slice of the candidates — combined shuffle
    // volume equals one full exchange, and the codegen'd source pipeline
    // is re-run once per branch. Both materialization alternatives were
    // MEASURED SLOWER at every level: r2's eager localCheckpoint of the
    // probed batch (block-store write on the hot path; the r2 sched
    // regression, 437k→378k) and a MEMORY_AND_DISK_SER persist (serialized
    // cache pressure collapses 32-core throughput 467k→385k). PlanAuditSpec
    // locks this shape (two url exchanges, no RDD-scan barrier).
    // The seen set arrives in TIERS: `seen` is the base (when maintained
    // via [[foldSeen]] it is url-partitioned+sorted+checkpointed, so this
    // anti-join needs NO exchange and NO sort on the seen side — the scan
    // streams checkpoint blocks straight into the merge), and `seenDeltas`
    // are the per-round folded increments since the last base fold. A ∪ of
    // the tiers would destroy the co-partitioning; a CHAIN of anti-joins
    // is set-equivalent (cand ∖ (A ∪ B) = (cand ∖ A) ∖ B) and every link
    // is exchange-free: anti-join preserves the left side's partitioning
    // AND its url sort order, so only the first link sorts the candidates.
    def antiSeen(d: DataFrame): DataFrame =
      (seen +: seenDeltas).foldLeft(d)((acc, s) =>
        acc.join(s, Seq("url"), "left_anti"))
    val fresh = seenSketch match {
      case Some(sk) =>
        val bc = spark.sparkContext.broadcast(sk)
        val probed = firstOnly
          .withColumn("maybe_seen_",
            graft.functions.sketch.sketch_contains(col("url"), bc))
        antiSeen(probed.where(col("maybe_seen_")).drop("maybe_seen_"))
          .unionByName(probed.where(!col("maybe_seen_")).drop("maybe_seen_"))
      case None =>
        antiSeen(firstOnly)
    }

    val eligible = fresh.where(domainAllowed(col("host"), cfg))

    // per-host cap (F7): prior enqueue count + rank within batch ≤ cap.
    // Two-phase to defuse hot-host skew: phase 1 ranks inside
    // (host, salt) — parallel across S buckets — and drops everything past
    // the cap (any row whose true host rank ≤ cap has bucket rank ≤ cap),
    // so phase 2's per-host window sees ≤ S·cap rows per host.
    // (An uncontended-host bypass — skip ranking for hosts whose whole
    // batch fits the cap — was measured and REJECTED: the extra per-host
    // totals aggregation and join exchange re-evaluate the admission tail
    // and cost more than the window sorts they save, at every parallelism
    // level.)
    val bucketW = Window.partitionBy(col("host"), col("salt_"))
      .orderBy(col("ord1"), col("ord2"))
    val pruned = eligible
      .withColumn("salt_", pmod(xxhash64(col("url")), lit(SaltBuckets)))
      .withColumn("r1", row_number().over(bucketW))
      .where(col("r1") <= lit(cfg.maxPagesPerDomain))
      .drop("r1", "salt_")
    val hostW = Window.partitionBy(col("host")).orderBy(col("ord1"), col("ord2"))
    // host_rank is KEPT on the output: admitted rows of one batch have
    // consecutive per-host ranks 1..k in (ord1, ord2) = seq order (the cap
    // predicate keeps a per-host PREFIX of the rank sequence), which is
    // exactly the increment the frontier's host_rank invariant needs — the
    // politeness dispatch is rank-arithmetic over it, never a re-sort
    // (see dispatchSelect).
    pruned
      .withColumn("host_rank", row_number().over(hostW).cast(LongType))
      .join(broadcast(hostCounts), Seq("host"), "left_outer")
      .withColumn("prior", coalesce(col("cnt"), lit(0L)))
      .where(col("prior") + col("host_rank") <= lit(cfg.maxPagesPerDomain))
      .drop("cnt", "prior")
  }

  /** Backfill `host_rank` — per-host consecutive 1..k in seq order — on a
   * frontier committed by an engine version that predates the column.
   * One window, paid once at resume time only: every steady-state path
   * (seeding, admission, dispatch deferral, reset reopen) maintains the
   * column arithmetically. */
  private def ensureHostRank(df: DataFrame): DataFrame =
    if (df.columns.contains("host_rank")) df
    else df.withColumn("host_rank", row_number()
      .over(Window.partitionBy(col("host")).orderBy(col("seq"))).cast(LongType))

  /** Bounded wait for an Observation's metrics on a DEDICATED DAEMON
   * thread (Await does not cancel an abandoned future — on the global pool
   * it would pin a pool thread forever). The observed write has always
   * finished before callers wait, so this resolves promptly; any failure
   * (listener never fired) degrades to None so metrics can never hang or
   * abort a commit whose table writes succeeded. */
  private def awaitObs(o: org.apache.spark.sql.Observation,
                       seconds: Int): Option[Map[String, Any]] =
    try {
      val p = scala.concurrent.Promise[Map[String, Any]]()
      val t = new Thread(() => p.tryComplete(scala.util.Try(o.get)), "graft-obs-wait")
      t.setDaemon(true)
      t.start()
      Some(scala.concurrent.Await.result(p.future,
        scala.concurrent.duration.Duration(seconds, "s")))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Convert a legacy (pre-LSM) frontier — live rows only, `host_rank`
   * RELATIVE (per-host 1..k over the live set) or absent — to the absolute
   * enqueue-rank form: abs = relative + rows of that host already
   * dispatched. Paid once at resume/reset of an old snapshot only. */
  private def toAbsRanks(df: DataFrame, hostSched: DataFrame): DataFrame =
    ensureHostRank(df)
      .join(hostSched, Seq("host"), "left_outer")
      .withColumn("host_rank",
        col("host_rank") + coalesce(col("dispatched"), lit(0L)))
      .drop("dispatched")

  /** Live rows of a RAW (absolute-rank) frontier view: a row is live iff
   * its absolute enqueue rank lies past the host's dispatch total —
   * dispatch always consumes a per-host PREFIX of the rank sequence, so
   * `host_rank > dispatched(host)` is exact, with no tombstones and no
   * per-row state. */
  private def liveRows(frontierRaw: DataFrame, hostSched: DataFrame): DataFrame =
    frontierRaw
      .join(hostSched, Seq("host"), "left_outer")
      .where(col("host_rank") > coalesce(col("dispatched"), lit(0L)))
      .drop("dispatched")

  /**
   * LSM-frontier dispatch (T4 at the 10^10-row design point). Input is the
   * RAW frontier view — live rows ∪ rows dispatched in earlier rounds —
   * whose `host_rank` is the per-host ABSOLUTE enqueue rank (consecutive
   * 1..k in seq order over every row ever enqueued for the host, dead or
   * alive). With disp = rows of the host dispatched so far (the same
   * dispatch history the politeness budget is computed from), liveness and
   * politeness collapse into ONE predicate:
   *
   *   dispatched this round  ⇔  disp < host_rank ≤ disp + remaining
   *
   * The deferred remainder is NEVER touched: not re-ranked (the shift is
   * absorbed into next round's larger disp), not materialized, and above
   * all not rewritten — the round's whole frontier cost is one read pass
   * over the raw view plus an O(dispatched) checkpoint, vs the previous
   * design's O(frontier) eager checkpoint AND O(frontier) replaced-table
   * write per round. That is the difference between per-round I/O
   * proportional to the politeness budget and per-round I/O proportional
   * to a 10^10-row frontier.
   *
   * `budget` carries (host, remaining, allow, disp_total); hosts absent
   * from it default to (defaultRemaining, allow, 0). Join strategy is
   * size-gated exactly like [[dispatchSelect]]: broadcast under the bound,
   * hinted shuffle-hash past it.
   */
  def dispatchSelectAbs(frontierRaw: DataFrame, budget: DataFrame,
                        defaultRemaining: Long,
                        budgetRowBound: Option[Long] = None,
                        broadcastRowLimit: Long = 1000000L): DataFrame = {
    val budgetSide =
      if (budgetRowBound.exists(_ <= broadcastRowLimit)) broadcast(budget)
      else budget.hint("shuffle_hash")
    frontierRaw
      .join(budgetSide, Seq("host"), "left_outer")
      .withColumn("disp_", coalesce(col("disp_total"), lit(0L)))
      .withColumn("rem_",
        greatest(coalesce(col("remaining"), lit(defaultRemaining)), lit(0L)))
      .where(col("host_rank") > col("disp_") &&
        col("host_rank") <= col("disp_") + col("rem_"))
      .select(col("url"), col("host"), col("depth"), col("retry"), col("seq"),
        coalesce(col("allow"), lit(true)).as("robots_allow"))
      // one materialization, O(dispatched): the slice is consumed by the
      // fetch join, the missing anti-join, and the dispatch-count agg
      .localCheckpoint(true)
  }

  /**
   * Politeness dispatch selection (T4): split the frontier into this
   * round's dispatched slice (per-host first `remaining` entries in seq
   * order) and the deferred remainder. `budget` has (host, remaining,
   * allow); hosts absent from it get `defaultRemaining`.
   *
   * SORT-FREE on an engine-maintained frontier: the frontier carries
   * `host_rank` — per-host consecutive 1..k in seq order — so "the first
   * `rem` per host in seq order" is the pure predicate
   * `host_rank <= rem`, and the deferred remainder's ranks shift down
   * arithmetically (`host_rank - rem` is again consecutive from 1). The
   * per-round dispatch is then ONE hash join (budget) + ONE
   * materialization: no window, no sort, no per-host serialization at
   * all — the two salted two-phase window sorts (and their second
   * checkpoint) that previously ranked the ENTIRE frontier every round
   * are gone, which is the difference between O(F log F) comparisons +
   * 2 full-frontier sort exchanges per round and O(F) predicate
   * evaluations on a 10^10-row frontier. The invariant is maintained
   * incrementally by every producer: admit() emits batch-local ranks
   * (its cap window, already paid), deferral shifts, and new entries
   * offset by the deferred per-host counts.
   *
   * JOIN STRATEGY, size-gated like the fetch join: the budget side is
   * per-HOST (one row per policy/dispatch-history host), so when the
   * caller can bound its row count under `broadcastRowLimit` the budget
   * is broadcast and the dispatch touches the frontier with NO exchange
   * at all — a pure map over the checkpointed frontier blocks. run()
   * maintains that bound for free (policy rows counted once per crawl +
   * a host_sched count observed during each commit's own write). Past
   * the limit — 10^8+ distinct hosts — it degrades to a shuffle-hash
   * join (hinted: a sort-merge join would re-sort the frontier and
   * defeat the point); AQE may still upgrade it to broadcast at runtime.
   *
   * A frontier WITHOUT the column (direct API callers, pre-upgrade
   * snapshots — run() backfills via ensureHostRank at resume) falls back
   * to the original salted two-phase window ranking.
   */
  def dispatchSelect(frontier: DataFrame, budget: DataFrame,
                     defaultRemaining: Long,
                     budgetRowBound: Option[Long] = None,
                     broadcastRowLimit: Long = 1000000L): (DataFrame, DataFrame) = {
    if (frontier.columns.contains("host_rank")) {
      val budgetSide =
        if (budgetRowBound.exists(_ <= broadcastRowLimit)) broadcast(budget)
        else budget.hint("shuffle_hash")
      val flagged = frontier
        .join(budgetSide, Seq("host"), "left_outer")
        .withColumn("rem_",
          greatest(coalesce(col("remaining"), lit(defaultRemaining)), lit(0L)))
        .withColumn("is_dispatched", col("host_rank") <= col("rem_"))
        // one materialization serves both consumers (fetch join + new
        // frontier) and the per-host count aggregations over each side
        .localCheckpoint(true)
      val dispatched = flagged.where(col("is_dispatched"))
        .select(col("url"), col("host"), col("depth"), col("retry"), col("seq"),
          coalesce(col("allow"), lit(true)).as("robots_allow"))
      val deferred = flagged.where(!col("is_dispatched"))
        .select(col("url"), col("host"), col("depth"), col("retry"), col("seq"),
          (col("host_rank") - col("rem_")).as("host_rank"))
      return (dispatched, deferred)
    }
    val withRem = frontier
      .join(budget, Seq("host"), "left_outer")
      .withColumn("rem", coalesce(col("remaining"), lit(defaultRemaining)))
    val bucketOrder = Window.partitionBy(col("host"), col("salt_"))
      .orderBy(col("seq"))
    // both returned frames derive from both window phases, and callers
    // consume them in SEPARATE actions (dispatch goes to the fetch join,
    // deferred into the next frontier) — without materialization each
    // window SORT would re-run per consumer. The two eager checkpoints pin
    // each sort to exactly one execution; the trade (one extra
    // materialization of the frontier slice vs a repeated O(n log n) sort)
    // is the same one the round's other checkpoints make.
    val phase1 = withRem
      .withColumn("salt_", pmod(xxhash64(col("url")), lit(SaltBuckets)))
      .withColumn("r1", row_number().over(bucketOrder))
      .localCheckpoint(true)
    val survivors = phase1.where(col("r1") <= col("rem")).drop("r1", "salt_")
    val deferredEarly = phase1.where(col("r1") > col("rem"))
      .select("url", "host", "depth", "retry", "seq")
    val hostOrder = Window.partitionBy(col("host")).orderBy(col("seq"))
    val marked = survivors
      .withColumn("host_rank", row_number().over(hostOrder))
      .withColumn("is_dispatched", col("host_rank") <= col("rem"))
      .localCheckpoint(true)
    val dispatched = marked.where(col("is_dispatched"))
      .select(col("url"), col("host"), col("depth"), col("retry"), col("seq"),
        coalesce(col("allow"), lit(true)).as("robots_allow"))
    val deferred = marked.where(!col("is_dispatched"))
      .select("url", "host", "depth", "retry", "seq")
      .unionByName(deferredEarly)
    (dispatched, deferred)
  }

  // ---- one round -----------------------------------------------------------

  /** Run the crawl to completion (or maxRounds), committing one snapshot
   * per round under `root`. Resumes from the latest committed round when
   * one exists (restore semantics gcloud_master.py:274-318).
   *
   * INVARIANT — `docs.doc_id` must be unique. The fetch join dispatches
   * one result row per (frontier url, matching doc); a duplicated doc_id
   * would duplicate result rows, inflating the arithmetic round counters
   * (nDispatched, frontierSize — potentially driving the loop guard
   * negative) and double-indexing the page. Validate untrusted corpora
   * with [[duplicateDocIds]] before crawling; the engine does not pay a
   * per-round distinct over the (100 TB) docs table to re-check it.
   *
   * `sketchThreshold`: seen-set size at which the broadcast sketch
   * prefilter engages in the admission anti-join (it is MAINTAINED from
   * round 0 — incrementally, O(admitted) per round — and checkpointed with
   * every snapshot, so engaging it is free; below the threshold the plain
   * anti-join is cheaper than a broadcast + filter pass).
   *
   * `stopRequested`: cooperative graceful-stop probe (the reference's
   * POST /stop_crawl → later start resumes, templates/app.py:753-805),
   * polled once per round at the loop boundary. When it turns true the
   * call returns after the last committed round with the frontier intact
   * — statusSummary still reports is_running while work remains — and a
   * subsequent run() resumes to the exact uninterrupted schedule. */
  def run(spark: SparkSession, docs: Dataset[Doc], seedUrls: Seq[String],
          policies: Dataset[HostPolicy], cfg: CrawlConfig, root: String,
          maxRounds: Int = 10000, sketchThreshold: Long = 100000L,
          seedFeed: Int => Seq[String] = _ => Nil,
          stopRequested: () => Boolean = () => false): CrawlSummary = {
    import spark.implicits._
    val snap = new SnapshotTable(root)

    val emptySeen = Seq.empty[String].toDF("url")
    val emptyCounts = Seq.empty[(String, Long)].toDF("host", "cnt")
    val emptySched = Seq.empty[(String, Long)].toDF("host", "dispatched")
    val emptyFailed = Seq.empty[(String, String, Int, Int, Long, String)]
      .toDF("url", "host", "depth", "retry", "seq", "error")
    val emptyQuar = Seq.empty[String].toDF("host")
    // `failed` is a HYBRID table like `seen`: the first commit of a fresh
    // crawl replaces it (the base), every later round APPENDS only that
    // round's terminal failures — the accumulated failure set is never
    // rewritten (it only shrinks at reset compactions). failedBase tracks
    // whether the base commit exists yet.
    var failedBase = snap.latestRound.isDefined

    // ---- restore or seed (gcloud_master.py:274-318 / :533-540) ----
    // `seen` is a HYBRID table: O(admitted) appended per round (a 10^10
    // seen set must never be rewritten per round), with replace commits
    // only at compactions/resets (SnapshotTable.loadHybrid).
    // The FRONTIER is a hybrid (LSM) table too, as of r5: `frontier` holds
    // the RAW view — live rows ∪ rows dispatched in earlier rounds — with
    // ABSOLUTE per-host enqueue ranks; a row is live iff host_rank >
    // dispatched(host), so dispatch never rewrites the deferred remainder
    // (see dispatchSelectAbs). `hostEnq` (host → rows ever enqueued)
    // supplies the rank offsets new entries queue behind.
    var sketch: graft.functions.SeenSketch = null
    // seed URLs not yet covered by any committed seen append (first round
    // of a fresh crawl appends them together with its admitted links)
    var pendingSeen = emptySeen
    var pendingSeenRows = 0L
    var round = 0
    var nextSeq = 0L
    var frontier: DataFrame = null
    var seen: DataFrame = null
    var hostCounts: DataFrame = null
    var hostSched: DataFrame = null
    var quarTbl: DataFrame = null
    var hostEnq: DataFrame = null
    var frontierSize = 0L
    var seenSizeKnown: Option[Long] = None
    // set when resuming a LEGACY (relative-rank, pre-LSM) snapshot: the
    // on-disk base still holds RELATIVE ranks, so the FIRST commit must
    // compact (write the converted absolute-rank live rows as the new
    // base) — appending absolute-rank tiers over a relative-rank base
    // would make the next round's reload mix the two rank semantics and
    // silently mis-classify liveness. One O(live) rewrite, paid once.
    var frontierLegacyBase = false
    snap.latestRound match {
      case Some(r) =>
        val m = snap.meta(r)
        // a missing OR unreadable (pre-v2 layout) blob falls back to a
        // rebuild from the seen table — resume must never be forfeited
        // over a sketch, which is reconstructible state by definition
        sketch = snap.loadBlob("seen_sketch", r)
          .flatMap(b => scala.util.Try(
            graft.functions.SeenSketch.deserialize(b)).toOption)
          .getOrElse(graft.functions.SeenSketch.build(
            snap.loadHybrid(spark, "seen", r), "url",
            cfg.seenSketch, cfg.sketchCapacity))
        round = r + 1
        nextSeq = m("nextSeq").toLong
        seen = snap.loadHybrid(spark, "seen", r)
        hostCounts = snap.loadReplaced(spark, "host_counts", r)
        hostSched = snap.loadReplaced(spark, "host_sched", r)
        quarTbl = snap.loadReplaced(spark, "quarantined", r)
        seenSizeKnown = m.get("seenSize").map(_.toLong)
        val rawF = snap.loadHybrid(spark, "frontier", r)
        if (m.get("frontierAbsRank").contains("1")) {
          frontier = rawF
          hostEnq = snap.loadReplaced(spark, "host_enq", r)
          frontierSize = m("frontierSize").toLong // abs commits always stamp it
        } else {
          // legacy replace-format snapshot: live rows only, relative (or
          // absent) ranks — convert once; host_enq derives from live counts
          // + the dispatch history
          frontier = toAbsRanks(rawF, hostSched)
          hostEnq = frontier.groupBy("host").agg(count(lit(1)).as("enq"))
            .join(hostSched, Seq("host"), "full_outer")
            .select(col("host"), (coalesce(col("enq"), lit(0L)) +
              coalesce(col("dispatched"), lit(0L))).as("enq"))
          frontierSize = m.get("frontierSize").map(_.toLong).getOrElse(rawF.count())
          frontierLegacyBase = true // first commit must compact (see above)
        }
      case None =>
        val seedCand = seedUrls.zipWithIndex.toDF("url", "idx")
          .select(col("url"),
            gf.url_policy_host(col("url")).as("host"),
            lit(0).as("depth"), lit(0).as("retry"),
            lit(-1L).as("ord1"), col("idx").as("ord2"))
        val admitted = admit(spark, seedCand, emptySeen, emptyCounts, cfg, None)
        // the frontier starts empty, so admit's batch-local host_rank IS
        // the absolute host_rank (nothing enqueued before, nothing dispatched)
        val f0 = assignSeq(spark,
          admitted.select("url", "host", "depth", "retry", "ord1", "ord2", "host_rank"),
          Seq(col("ord1"), col("ord2")), 0L)
          .select("url", "host", "depth", "retry", "seq", "host_rank")
          .localCheckpoint(true)
        val s0 = f0.select("url")
        val c0 = f0.groupBy("host").agg(count(lit(1)).as("cnt"))
        val nSeed = f0.count()
        sketch = graft.functions.SeenSketch.empty(cfg.seenSketch, cfg.sketchCapacity)
        graft.functions.SeenSketch.addAll(sketch, s0, "url", nSeed)
        pendingSeen = s0
        pendingSeenRows = nSeed
        nextSeq = nSeed
        frontier = f0
        seen = s0
        hostCounts = c0
        hostSched = emptySched
        quarTbl = emptyQuar
        hostEnq = c0.select(col("host"), col("cnt").as("enq"))
        frontierSize = nSeed
        seenSizeKnown = Some(nSeed)
    }

    // tiny per-host table; joined as the LEFT of outer joins, so no explicit
    // broadcast hint (build-left is illegal for left_outer) — AQE broadcasts
    // the legal side on its own
    val policyDf = policies.toDF() // host, allow, crawl_delay_s, max_pages
    // dispatch budget-side row bound (per-HOST rows: policy ∪ dispatch
    // history). policy rows counted once per crawl; hostSchedSize updated
    // per round from an observation on the commit's own host_sched write
    // (zero extra jobs). Gates dispatchSelect's broadcast-vs-shuffle choice.
    val policyRows = policyDf.count()
    var hostSchedSize: Long = snap.latestRound match {
      case Some(_) => hostSched.count() // once, at resume only
      case None => 0L
    }
    // host_enq row bound for the rank-offset joins (same gate pattern;
    // maintained per round from an observation on the commit's own write).
    // Fresh crawls use the seed count as a safe over-bound (hosts ≤ seeds).
    var hostEnqSize: Long = snap.latestRound match {
      case Some(_) => hostEnq.count() // once, at resume only
      case None => frontierSize
    }
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]

    // seen LSM (see foldSeen): `seen` becomes the folded base; per-round
    // admitted urls append as folded delta tiers; the base refolds when
    // the deltas reach a quarter of it (or the anti-join chain would grow
    // past 8 links). The parquet hybrid table stays the only durable form
    // — this is purely the hot-path join layout.
    seen = foldSeen(seen)
    var seenDeltas: List[DataFrame] = Nil
    var seenDeltaRows = 0L
    def seenAll: DataFrame = seenDeltas.foldLeft(seen)(_ unionByName _)
    def appendSeenDelta(urls: DataFrame, n: Long, total: Long): Unit = {
      seenDeltas :+= foldSeen(urls)
      seenDeltaRows += n
      if (seenDeltas.length >= 8 || seenDeltaRows * 4 >= total) {
        seen = foldSeen(seenAll); seenDeltas = Nil; seenDeltaRows = 0
      }
    }

    var seenSize = seenSizeKnown.getOrElse(seen.count())
    // frontier-LSM bookkeeping: dead rows accumulated in the STORED raw
    // table since its last base rewrite, and delta tiers appended since —
    // the compaction triggers (see the commit block)
    var frontierDeadRows = 0L
    var frontierTiers = 0

    // a saturated sketch (reloaded from a saturated blob, or seeds past
    // capacity) must never serve as the admission prefilter — rebuild at
    // growing capacity until healthy before the first round uses it
    var restoreCap = math.max(4L * math.max(seenSize, 1L), sketch.capacity * 4)
    while (sketch.saturated) {
      sketch = graft.functions.SeenSketch.build(seen, "url", cfg.seenSketch, restoreCap)
      restoreCap *= 4
    }

    // `seedFeed` must be a pure function of the round number (it is called
    // once in the loop guard and once in the body) — the config-hot-reload
    // contract: "what new seeds appeared by round r" (T5).
    // graceful stop (POST /stop_crawl, templates/app.py:753-805): the flag
    // is checked at the ROUND BOUNDARY only — a BSP round either commits
    // whole or not at all, so any stop leaves exactly the state a crash
    // would, and a later run() resumes from it (resume-equivalence spec).
    // statusSummary keeps reporting is_running=true while work remains,
    // mirroring the reference's stopped-but-resumable crawl.
    while (!stopRequested() && round < maxRounds &&
           (frontierSize > 0 || seedFeed(round).nonEmpty)) {
      // ---- config hot-reload (T5, gcloud_master.py:542-617): seeds that
      // appeared since the last round are admitted at depth 0 through the
      // SAME gate as extracted links (seen-dedup D1/D3, allowed-domains,
      // per-host cap) and appended at the back of the queue before this
      // round's dispatch — the reference's add-seeds-to-running-crawl flow.
      val injectedSeeds = seedFeed(round)
      val traceT0 = System.nanoTime() // SPARK_GRAFT_CRAWL_TRACE=1 timing
      var traceCommitT = 0L
      var hostCountsDirty = false // host_counts is carried unless this round admitted
      // rank-offset side for new entries: gated broadcast of the per-host
      // enqueue totals (same size class and gate as the dispatch budget)
      def enqSide: DataFrame =
        if (hostEnqSize <= cfg.broadcastRowLimit) broadcast(hostEnq)
        else hostEnq.hint("shuffle_hash")
      var injectedEntries: Option[DataFrame] = None
      var nInjected = 0L
      if (injectedSeeds.nonEmpty) {
        val cand = injectedSeeds.zipWithIndex.toDF("url", "idx")
          .select(col("url"), gf.url_policy_host(col("url")).as("host"),
            lit(0).as("depth"), lit(0).as("retry"),
            lit(-1L).as("ord1"), col("idx").as("ord2"))
        val prefilterInj =
          if (seenSize >= sketchThreshold && !sketch.saturated) Some(sketch) else None
        val adm = admit(spark, cand, seen, hostCounts, cfg, prefilterInj, seenDeltas)
          .select("url", "host", "depth", "retry", "ord1", "ord2", "host_rank")
        // injected entries queue BEHIND everything the host ever enqueued:
        // absolute rank = per-host enqueue total + admit's batch-local rank
        // (a broadcast join — the O(frontier) per-host count aggregation
        // the relative-rank design paid on injection rounds is gone)
        val entries = assignSeq(spark, adm, Seq(col("ord1"), col("ord2")), nextSeq)
          .select("url", "host", "depth", "retry", "seq", "host_rank")
          .join(enqSide, Seq("host"), "left_outer")
          .withColumn("host_rank", col("host_rank") + coalesce(col("enq"), lit(0L)))
          .drop("enq")
          .localCheckpoint(true)
        val nInj = entries.count()
        if (nInj > 0) {
          hostCountsDirty = true
          nextSeq += nInj
          frontier = frontier.unionByName(entries)
          injectedEntries = Some(entries)
          nInjected = nInj
          appendSeenDelta(entries.select("url"), nInj, seenSize + nInj)
          pendingSeen = pendingSeen.unionByName(entries.select("url"))
          pendingSeenRows += nInj
          val injCounts = entries.groupBy("host").agg(count(lit(1)).as("inj_cnt"))
          hostCounts = hostCounts.join(injCounts, Seq("host"), "full_outer")
            .select(col("host"), (coalesce(col("cnt"), lit(0L)) +
              coalesce(col("inj_cnt"), lit(0L))).as("cnt"))
          hostEnq = hostEnq.join(injCounts, Seq("host"), "full_outer")
            .select(col("host"), (coalesce(col("enq"), lit(0L)) +
              coalesce(col("inj_cnt"), lit(0L))).as("enq"))
          hostEnqSize += nInj // safe over-bound until the commit observation
          graft.functions.SeenSketch.addAll(sketch, entries.select("url"), "url", nInj)
          seenSize += nInj
          frontierSize += nInj // keep the broadcast-gate bound exact
        }
      }

      // ---- politeness window (T4): per-host budget from accumulated time.
      // total_allowed(host, r) = floor((r+1)*roundSeconds / delay); the
      // remaining budget subtracts everything already dispatched — this
      // reproduces the reference's min-interval schedule (1 fetch per
      // crawl_delay seconds per host) without sleeping. Full-outer with the
      // dispatch history so hosts without a policy row still accumulate
      // against the default delay (oracle: delayOf falls back to default).
      val budget = policyDf
        .join(hostSched, Seq("host"), "full_outer")
        .withColumn("total_allowed",
          floor(lit((round + 1) * cfg.roundSeconds) /
            coalesce(when(col("crawl_delay_s") > 0, col("crawl_delay_s")),
              lit(cfg.defaultCrawlDelayS))))
        .withColumn("remaining",
          col("total_allowed") - coalesce(col("dispatched"), lit(0L)))
        .select(col("host"), col("remaining"), col("allow"),
          coalesce(col("dispatched"), lit(0L)).as("disp_total"))
      val defaultTotal =
        math.floor((round + 1) * cfg.roundSeconds / cfg.defaultCrawlDelayS).toLong

      // dispatch selection over the RAW LSM frontier (see dispatchSelectAbs
      // — one hash join + one O(dispatched) materialization; liveness and
      // politeness are a single rank predicate; the deferred remainder is
      // never touched; the budget side broadcasts while bounded).
      val dispatchedRaw = dispatchSelectAbs(frontier, budget, defaultTotal,
        Some(policyRows + hostSchedSize), cfg.broadcastRowLimit)
      // problematic-domain quarantine (F9, gcloud_crawler.py:242-253):
      // fetches to quarantined hosts short-circuit as failures. The flag is
      // stamped at dispatch (quarantine table is per-host and tiny —
      // broadcast), takes effect the round AFTER a host is quarantined
      // (BSP boundary normalization of the reference's immediate set-add),
      // and still consumes the dispatch slot.
      // dispatchedRaw is already checkpointed (O(dispatched)) inside
      // dispatchSelectAbs, and the quarantine stamp is a broadcast hash
      // join — consumers below re-run only that narrow tail, so no further
      // materialization is needed
      val dispatched = dispatchedRaw
        .join(broadcast(quarTbl.withColumn("quar_", lit(true))), Seq("host"), "left_outer")
        .withColumn("quar", coalesce(col("quar_"), lit(false))).drop("quar_")

      // ---- "fetch": join the politeness-bounded dispatched set against
      // docs. Inner join finds fetched pages; anti join derives 404s. The
      // join strategy is SIZE-GATED: a broadcast join only while the
      // dispatched count is under cfg.broadcastRowLimit (the per-host
      // budget GROWS with round number, so "dispatched is small" is not an
      // invariant); past the limit, a distributed bloom filter prunes the
      // 100 TB docs scan down to ~dispatched size AT THE SCAN (non-matching
      // rows never shuffle — FPs are re-checked exactly by the equi-join),
      // and a shuffle-hash join finishes, so neither the driver nor any
      // executor ever holds the whole dispatched set.
      // dispatched ⊆ frontier, so when the whole frontier is under the
      // limit the count job is unnecessary (saves one fixed-cost job in
      // the common small-round case)
      val nDisp =
        if (frontierSize <= cfg.broadcastRowLimit) frontierSize
        else dispatched.count() // cheap: narrow over the checkpointed phase-2 rows
      val docsDf = docs.toDF()
      val (fetched, missing) =
        if (nDisp <= cfg.broadcastRowLimit) {
          val f = docsDf.join(broadcast(dispatched), col("doc_id") === col("url"))
          val m = dispatched.join(
            broadcast(f.select(col("url").as("fetched_url"))),
            col("url") === col("fetched_url"), "left_anti")
          (f, m)
        } else {
          val urlBloom = graft.functions.SeenSketch.build(
            dispatched.select("url"), "url", "bloom", math.max(nDisp, 1024L))
          val bcBloom = spark.sparkContext.broadcast(urlBloom)
          val prunedDocs = docsDf.where(
            graft.functions.sketch.sketch_contains(col("doc_id"), bcBloom))
          val f = prunedDocs.join(dispatched.hint("shuffle_hash"),
            col("doc_id") === col("url"))
          val m = dispatched.join(
            f.select(col("url").as("fetched_url")).hint("shuffle_hash"),
            col("url") === col("fetched_url"), "left_anti")
          (f, m)
        }

      val robotsOn = cfg.respectRobots
      val fetchedTyped = fetched.select(
        col("url"), col("host"), col("depth"), col("retry"), col("seq"),
        when(col("quar"), lit("quarantined")) // checked FIRST, as in the ref
          .when(lit(robotsOn) && !col("robots_allow"), lit("skipped_robots"))
          .when(col("retry") < col("flaky_fails"), lit("timeout"))
          .when(col("content_type") =!= "text/html", lit("ok_non_html"))
          .otherwise(lit("ok")).as("status"),
        col("raw"), col("content_type"))

      val results = fetchedTyped.unionByName(
        missing.select(col("url"), col("host"), col("depth"), col("retry"), col("seq"),
          // same gate ORDER as the fetched branch: quarantine, then robots
          // (the reference checks robots before fetching, so a dangling URL
          // on a disallowed host is skipped_robots, not a 404), then 404
          when(col("quar"), lit("quarantined"))
            .when(lit(robotsOn) && !col("robots_allow"), lit("skipped_robots"))
            .otherwise(lit("failed")).as("status"),
          lit(null).cast("string").as("raw"),
          lit(null).cast("string").as("content_type")))
        .withColumn("spans",
          when(col("status") === "ok", gf.extract_spans(col("raw")))
            .otherwise(array().cast(graft.functions.SpanExtract.schema)))
        .localCheckpoint(true) // parse once; reused by links/doc_store/log

      // ---- timeout requeue (T2/T3): retry+1, terminal past maxRetries.
      // Requeues re-enter the frontier, so they need batch-local per-host
      // ranks for the host_rank invariant. This window runs over the
      // REQUEUE SET ONLY — bounded by the round's politeness budget per
      // host (requeues ⊆ dispatched), never the frontier — so it stays
      // small by construction at any crawl size.
      val timeouts = results.where(col("status") === "timeout")
      val reqW = Window.partitionBy(col("host")).orderBy(col("seq"))
      val requeue = timeouts.where(col("retry") + 1 <= cfg.maxRetries)
        .withColumn("lrank_", row_number().over(reqW).cast(LongType))
        .select(col("url"), col("host"), col("depth"),
          (col("retry") + 1).as("retry"), col("seq").as("ord1"), lit(0).as("ord2"),
          col("lrank_"))
      val timeoutFail = timeouts.where(col("retry") + 1 > cfg.maxRetries)

      // ---- link expansion: ordered anchors → canonicalize → candidates
      val parents = results.where(col("status") === "ok" &&
        col("depth") < cfg.maxDepth) // depth gate F6 (gcloud_master.py:425-427)
      val candidates = parents
        .select(col("url").as("page_url"), col("depth").as("parent_depth"),
          col("seq").as("ord1"), posexplode(col("spans")).as(Seq("pos", "span")))
        .where(col("span.kind") === "link")
        .select(
          gf.url_canonicalize(col("page_url"), col("span.media_ref")).as("url"),
          (col("parent_depth") + 1).as("depth"), col("ord1"),
          col("span.offset").as("ord2"))
        .where(col("url").isNotNull)
        .withColumn("host", gf.url_policy_host(col("url")))
        .withColumn("retry", lit(0))

      val prefilter =
        if (seenSize >= sketchThreshold && !sketch.saturated) Some(sketch) else None
      val admitted = admit(spark, candidates, seen, hostCounts, cfg, prefilter, seenDeltas)
        .select("url", "host", "depth", "retry", "ord1", "ord2", "host_rank")
        .localCheckpoint(true)

      // ---- new sequence numbers: timeout requeues go to the back of the
      // queue first (gcloud_master.py:525-531), then children in
      // (parent_seq, link_pos) BFS order (:336).
      // Batch-local per-host ranks (lrank_) follow the same order:
      // requeues rank first, admitted rows offset by the host's requeue
      // count — admit's host_rank is already the admitted-batch rank.
      val reqCnt = requeue.groupBy("host").agg(count(lit(1)).as("rq_"))
      val adds = requeue.withColumn("bucket", lit(0))
        .unionByName(admitted
          .join(broadcast(reqCnt), Seq("host"), "left_outer")
          .withColumn("lrank_", col("host_rank") + coalesce(col("rq_"), lit(0L)))
          .drop("host_rank", "rq_")
          .withColumn("bucket", lit(1)))
      // final ABSOLUTE frontier ranks: new entries queue behind everything
      // the host ever enqueued — lrank_ + the per-host enqueue total (a
      // gated-broadcast join; equal to the old deferred-count offset plus
      // the dispatch history, which the liveness predicate subtracts back)
      val newEntries = assignSeq(spark, adds,
        Seq(col("bucket"), col("ord1"), col("ord2")), nextSeq)
        .join(enqSide, Seq("host"), "left_outer")
        .withColumn("host_rank", col("lrank_") + coalesce(col("enq"), lit(0L)))
        .select("url", "host", "depth", "retry", "seq", "host_rank")
        .localCheckpoint(true)
      val addsCount = newEntries.count()
      nextSeq += addsCount
      // seen grows by admitted only (requeues are already-seen URLs)
      val admittedCount = admitted.count() // cheap: checkpointed

      // ---- state updates (the deferred remainder needs NONE: its rows sit
      // untouched in the raw LSM view; next round's larger dispatch totals
      // shift their effective ranks arithmetically)
      if (admittedCount > 0)
        appendSeenDelta(admitted.select("url"), admittedCount, seenSize + admittedCount)
      val newSeen = seenAll

      // incremental sketch maintenance, DISTRIBUTED: per-partition delta
      // shards over this round's admitted URLs, merged into the running
      // sketch on the driver (SeenSketch.addAll) — O(adds) spread across
      // executors, never a driver-side row loop. On saturation, rebuild at
      // growing capacity from the full seen table until healthy (amortized
      // O(seen) per crawl, like a growable array).
      if (admittedCount > 0)
        graft.functions.SeenSketch.addAll(sketch, admitted.select("url"), "url", admittedCount)
      var rebuildCap = math.max(4L * (seenSize + admittedCount), sketch.capacity * 4)
      while (sketch.saturated) {
        sketch = graft.functions.SeenSketch.build(newSeen, "url", cfg.seenSketch, rebuildCap)
        rebuildCap *= 4
      }

      // terminal failures of THIS round (CrawlState.failed,
      // gcloud_master.py:197-207) — appended to the hybrid failed table;
      // the reset-failures flow (D4) re-opens them.
      val failedNow = results
        .where(col("status").isin("failed", "skipped_robots", "quarantined"))
        .unionByName(timeoutFail)
        .select(col("url"), col("host"), col("depth"), col("retry"), col("seq"),
          when(col("status") === "failed", lit("http_404"))
            .when(col("status") === "skipped_robots", lit("robots_disallowed"))
            .when(col("status") === "quarantined", lit("quarantined_host"))
            .otherwise(lit("retries_exhausted")).as("error"))
      // hosts whose URLs exhausted their retries this round join the
      // quarantine (the reference's connection-failure path,
      // gcloud_crawler.py:432,452) — effective from the NEXT round
      val newQuar = quarTbl.unionByName(timeoutFail.select("host")).distinct()
      val admittedCounts = admitted.groupBy("host").agg(count(lit(1)).as("add_cnt"))
      val newHostCounts = hostCounts.join(admittedCounts, Seq("host"), "full_outer")
        .select(col("host"),
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("add_cnt"), lit(0L))).as("cnt"))
      val dispatchedCounts = dispatched.groupBy("host").agg(count(lit(1)).as("d_cnt"))
      val newHostSched = hostSched.join(dispatchedCounts, Seq("host"), "full_outer")
        .select(col("host"),
          (coalesce(col("dispatched"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("dispatched"))
      // per-host enqueue totals grow by this round's new entries (requeues
      // included — they re-enter at fresh absolute ranks)
      val addCounts = newEntries.groupBy("host").agg(count(lit(1)).as("add_"))
      val newHostEnq = hostEnq.join(addCounts, Seq("host"), "full_outer")
        .select(col("host"), (coalesce(col("enq"), lit(0L)) +
          coalesce(col("add_"), lit(0L))).as("enq"))

      // ---- lineage + docs-for-indexing (S7/S9: fetch_log + doc_store).
      // part_id records which executor partition fetched/extracted the row
      // (per-partition lineage; observability only — never ordering).
      val fetchLog = results.select(
        lit(round).as("round"), col("url"), col("host"), col("depth"),
        col("seq"), col("status"), spark_partition_id().as("part_id"),
        when(col("status") === "failed", lit("http_404"))
          .when(col("status") === "timeout", lit("fetch_timeout"))
          .when(col("status") === "skipped_robots", lit("robots_disallowed"))
          .when(col("status") === "quarantined", lit("quarantined_host"))
          .otherwise(lit(null).cast("string")).as("error"),
        when(col("status") === "ok",
          size(filter(col("spans"), s => s("kind") === "link")))
          .otherwise(lit(0)).as("links_found"))

      val docStore = results.where(col("status") === "ok").select(
        lit(round).as("round"), col("url"),
        coalesce(element_at(
          transform(filter(col("spans"), s => s("kind") === "title"), s => s("text")), 1),
          lit("")).as("title"),
        concat_ws(" ", transform(
          filter(col("spans"), s => s("text") =!= ""), s => s("text"))).as("text"))

      // ---- raw-page store (S6, gcloud_crawler.py:555-590): every
      // successfully fetched page keeps its raw body. Written UNBUCKETED,
      // straight from the checkpointed results — raw bodies are the round's
      // biggest payload and a bucketing repartition would shuffle all of
      // them every round; the point lookup (J6) still prunes via parquet
      // min/max footer stats on the url column.
      val pages = results.where(col("status").isin("ok", "ok_non_html")).select(
        lit(round).as("round"), col("url"), col("host"),
        col("raw"), col("content_type"))

      // ---- incremental inverted index (T8/S9, gcloud_indexer.py:43-62,
      // 356-366): postings for THIS round's docs only — idempotent on
      // (term, url) globally because seen-dedup admits each url once ever.
      val postingsRows = SearchIndex.postings(
        docStore.select("url", "title", "text")).withColumn("round", lit(round))

      // ---- per-worker stats (A4/T7, gcloud_master.py:702-725): processed
      // counts per executor partition, with the round as the heartbeat
      // clock (wall-clock-free liveness: a worker partition that appears in
      // round r was alive in round r).
      val workerStats = fetchLog
        .groupBy(col("round"), col("part_id"))
        .agg(count(lit(1)).as("processed"),
          count(when(col("status").isin("ok", "ok_non_html"), 1)).as("completed"),
          sum(col("links_found")).as("links_found"))

      // ---- round counters (CrawlState sizes, gcloud_master.py:686-688),
      // computed pre-commit so they ride in the SAME atomic snapshot and
      // /status projections (§3.3) read tables, never driver state.
      // ONE aggregation job over the checkpointed results replaces five
      // separate counts — per-round fixed driver cost is the crawl-round
      // scaling bottleneck at sandbox scale (BENCH.md).
      val byStatus = results.groupBy("status").agg(
        count(lit(1)).as("n"),
        count(when(col("retry") + 1 > cfg.maxRetries, 1)).as("n_exhausted"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      def n(s: String) = byStatus.get(s).map(_._1).getOrElse(0L)
      val nDispatched = byStatus.values.map(_._1).sum
      val timeoutExhausted = byStatus.get("timeout").map(_._2).getOrElse(0L)
      val nFailed = n("failed") + n("skipped_robots") + n("quarantined") + timeoutExhausted
      val nCompleted = n("ok") + n("ok_non_html")
      val nRequeued = n("timeout") - timeoutExhausted
      // no count job: dispatch consumes a per-host prefix of the live set,
      // so the new live size is pure arithmetic
      frontierSize = frontierSize - nDispatched + addsCount
      seenSize = seenSize + admittedCount
      if (admittedCount > 0) hostCountsDirty = true
      val rs = RoundStats(round, nDispatched, nCompleted, nFailed,
        nRequeued, addsCount, frontierSize, seenSize)
      stats += rs
      val nOkHtml = n("ok")

      // ---- commit round snapshot (T6): atomic manifest = round boundary.
      // Per-round write cost tracks what CHANGED, not accumulated table
      // sizes: `seen`/`failed` APPEND this round's delta only, the FRONTIER
      // is an LSM hybrid — this round's new entries append as a delta tier
      // (physically host-hash bucketed, the rule's `bucket(N, host_hash)`
      // partitioned priority frontier), the base is rewritten (compacted to
      // live rows) only when dead rows outgrow live rows or the tier chain
      // gets long — and unchanged replaced tables (host_counts with no
      // admissions, quarantined with no new exhaustions) are CARRIED: the
      // manifest points at the round that last wrote them, no data moves.
      // Per-round frontier bytes written are therefore ∝ (admitted +
      // requeued), never ∝ frontier size — the write-amplification bound
      // that makes a 10^10-row frontier commit-able every round.
      // host_sched/host_enq row counts observed during the commit's own
      // writes (same zero-extra-pass pattern as the postings index stats)
      // — they feed the next round's broadcast gates.
      val schedObs = new org.apache.spark.sql.Observation()
      val enqObs = new org.apache.spark.sql.Observation()
      val replacedTables = scala.collection.mutable.Map[String, DataFrame](
        "host_sched" -> newHostSched.observe(schedObs, count(lit(1)).as("n")))
      val carriedTables = scala.collection.mutable.Map.empty[String, Int]
      val appendFrontier = injectedEntries match {
        case Some(ie) => ie.unionByName(newEntries)
        case None => newEntries
      }
      frontierDeadRows += nDispatched
      val frontierCompact = !failedBase || frontierLegacyBase ||
        frontierDeadRows > frontierSize || frontierTiers >= 64
      if (frontierCompact) {
        // base rewrite: live rows only (dead prefixes drop out), absolute
        // ranks preserved — O(live), amortized against the dead rows shed
        replacedTables += "frontier" ->
          liveRows(frontier.unionByName(newEntries), newHostSched)
        frontierDeadRows = 0
        frontierTiers = 0
        frontierLegacyBase = false
      }
      val enqDirty = addsCount > 0 || nInjected > 0
      if (enqDirty || !failedBase)
        replacedTables += "host_enq" -> newHostEnq.observe(enqObs, count(lit(1)).as("n"))
      else carriedTables += "host_enq" -> (round - 1)
      if (hostCountsDirty || !failedBase) replacedTables += "host_counts" -> newHostCounts
      else carriedTables += "host_counts" -> (round - 1)
      if (timeoutExhausted > 0 || !failedBase) replacedTables += "quarantined" -> newQuar
      else carriedTables += "quarantined" -> (round - 1)

      val appendedTables = scala.collection.mutable.Map[String, DataFrame](
        "counters" -> Seq(rs).toDS().toDF().coalesce(1))
      if (!frontierCompact && addsCount + nInjected > 0) {
        appendedTables += "frontier" -> appendFrontier
        frontierTiers += 1
      }
      if (!failedBase) replacedTables += "failed" -> failedNow
      else if (nFailed > 0) appendedTables += "failed" -> failedNow
      if (admittedCount > 0 || pendingSeenRows > 0)
        appendedTables += "seen" -> pendingSeen.unionByName(admitted.select("url"))
      if (nDispatched > 0) {
        appendedTables += "fetch_log" -> fetchLog
        appendedTables += "worker_stats" -> workerStats
      }
      if (nCompleted > 0) appendedTables += "pages" -> pages
      // index-size stats (A4, gcloud_indexer.py:566-573): approx distinct
      // terms/docs of this round's postings DELTA, observed during the
      // postings write itself (zero extra pass) and recorded in the same
      // atomic manifest; Crawler.indexStats gives the exact cumulative
      // numbers on demand.
      val idxObs = if (nOkHtml > 0) Some(new org.apache.spark.sql.Observation()) else None
      if (nOkHtml > 0) {
        appendedTables += "doc_store" -> docStore
        appendedTables += "postings" -> postingsRows.observe(idxObs.get,
          approx_count_distinct(col("term")).as("terms"),
          approx_count_distinct(col("url")).as("docs"),
          count(lit(1)).as("postings"))
      }
      traceCommitT = System.nanoTime()
      snap.commit(spark, round,
        replaced = replacedTables.toMap,
        appended = appendedTables.toMap,
        meta = Map("nextSeq" -> nextSeq.toString,
          "frontierSize" -> frontierSize.toString,
          "seenSize" -> seenSize.toString,
          // marks the frontier's rank semantics (absolute enqueue ranks +
          // hybrid commits); resume converts legacy snapshots without it
          "frontierAbsRank" -> "1"),
        blobs = Map("seen_sketch" -> graft.functions.SeenSketch.serialize(sketch)),
        bucketed = Map(
          "frontier" -> pmod(xxhash64(col("host")), lit(graft.plans.SnapshotTable.Buckets))),
        carried = carriedTables.toMap,
        // index stats from the observed postings write (see awaitObs): any
        // failure degrades to stats-less meta — metrics must never abort a
        // commit whose table writes succeeded
        metaLate = () => idxObs.flatMap(o => awaitObs(o, 60)).map(m =>
          Map("idx_new_terms_approx" -> m("terms").toString,
            "idx_new_docs_approx" -> m("docs").toString,
            "idx_new_postings" -> m("postings").toString))
          .getOrElse(Map.empty))
      pendingSeen = emptySeen
      pendingSeenRows = 0L
      // the observed host_sched/host_enq writes completed inside commit, so
      // the bounded waits resolve within moments; any miss falls back to a
      // safe OVER-bound (hosts can only have grown by this round's rows),
      // so the broadcast gates never under-estimate their build sides
      val traceObsT = System.nanoTime()
      hostSchedSize = awaitObs(schedObs, 10)
        .flatMap(_.get("n").map(_.asInstanceOf[Long]))
        .getOrElse(hostSchedSize + nDispatched)
      if (enqDirty || !failedBase)
        hostEnqSize = awaitObs(enqObs, 10)
          .flatMap(_.get("n").map(_.asInstanceOf[Long]))
          .getOrElse(hostEnqSize + addsCount)
      if (sys.env.get("SPARK_GRAFT_CRAWL_TRACE").contains("1"))
        System.err.println(f"[crawl-trace] round=$round obsWait=" +
          f"${(System.nanoTime() - traceObsT) / 1e9}%.2f")
      failedBase = true

      // reload from the committed snapshot: truncates lineage and makes the
      // next round read exactly what a resume would read. `seen` is NOT
      // reloaded: its in-memory LSM form (folded base + folded deltas,
      // all checkpointed ⇒ lineage already truncated) is row-for-row the
      // parquet hybrid's content, and reloading would re-pay the fold
      // shuffle every round — the exact cost the LSM exists to avoid. The
      // frontier reloads as its RAW hybrid view (base + delta tiers).
      frontier = snap.loadHybrid(spark, "frontier", round)
      hostCounts = snap.loadReplaced(spark, "host_counts", round)
      hostSched = snap.loadReplaced(spark, "host_sched", round)
      hostEnq = snap.loadReplaced(spark, "host_enq", round)
      quarTbl = snap.loadReplaced(spark, "quarantined", round)
      if (sys.env.get("SPARK_GRAFT_CRAWL_TRACE").contains("1")) {
        val now = System.nanoTime()
        System.err.println(f"[crawl-trace] round=$round wall=${(now - traceT0) / 1e9}%.2f " +
          f"commit=${(now - traceCommitT) / 1e9}%.2f disp=$nDispatched adds=$addsCount " +
          f"fsize=$frontierSize tiers=$frontierTiers dead=$frontierDeadRows compact=$frontierCompact")
      }
      round += 1
    }
    CrawlSummary(round, stats.toSeq)
  }

  /** doc_id-uniqueness validation for untrusted corpora (see run()'s
   * invariant note): number of doc_ids appearing more than once. One
   * hash-aggregation pass; run it once at ingestion, not per round. */
  def duplicateDocIds(docs: Dataset[Doc]): Long =
    docs.toDF().groupBy("doc_id").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).count()

  /** Status projection (§3.3, cli.py:98-124 / GET /status): the per-round
   * counter rows from the committed snapshots — queue/completed/failed/
   * seen sizes per round, no driver state involved. */
  def status(spark: SparkSession, root: String): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    snap.loadAppended(spark, "counters", r).orderBy("round")
  }

  /** Exact index-size stats on demand (A4 remainder; the reference's
   * indexer heartbeat reports len(url_index)/len(content_index),
   * gcloud_indexer.py:566-573): distinct terms, indexed docs, and posting
   * rows of the PERSISTED cumulative index. Exact countDistinct at call
   * time — the on-demand analog of the reference's O(1) dict-size reads;
   * the per-round manifests additionally carry approx per-round deltas
   * ([[indexStatsHistory]]) observed for free during each postings write. */
  def indexStats(spark: SparkSession, root: String): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    snap.loadAppendedOr(spark, "postings", r, PostingsDdl).agg(
      countDistinct(col("term")).as("distinct_terms"),
      countDistinct(col("url")).as("indexed_docs"),
      count(lit(1)).as("postings_rows"))
  }

  /** Per-round index growth (round, new_terms_approx, new_docs_approx,
   * new_postings) read from the round manifests — the persisted form of
   * the reference's heartbeat log lines. Rounds that indexed nothing
   * carry no stats and are omitted. */
  def indexStatsHistory(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    (0 to r).flatMap { round =>
      val m = snap.meta(round) // committed rounds are contiguous
      for {
        t <- m.get("idx_new_terms_approx")
        d <- m.get("idx_new_docs_approx")
        p <- m.get("idx_new_postings")
      } yield (round, t.toLong, d.toLong, p.toLong)
    }.toDF("round", "new_terms_approx", "new_docs_approx", "new_postings")
  }

  /** Full /status projection (templates/app.py:557-601, gcloud_master.py:
   * 197-207): one row with is_running plus the latest counters.
   * is_running = the committed frontier is non-empty (a BSP crawl is
   * "running" iff work remains; the manifest's frontierSize meta is
   * stamped at commit, so this reads no table). */
  def statusSummary(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    val m = snap.meta(r)
    // every commit flow stamps frontierSize (crawl rounds and resets
    // alike), so is_running and frontier_size come from ONE consistent
    // source; pre-stamping snapshots fall back to counting the committed
    // frontier table — still the same source for both fields, so a
    // just-reset crawl can never report running=true with size 0
    val fSize = m.get("frontierSize").map(_.toLong).getOrElse(
      snap.loadReplaced(spark, "frontier", r).count())
    // seen_size reads the SAME commit's meta stamp (crawl rounds and resets
    // both stamp it), so a forget-reset that shrinks the seen set is
    // reflected immediately — the last crawl round's counters row (the
    // pre-stamping fallback) would show the stale pre-reset count
    val seenSz = m.get("seenSize").map(_.toLong).getOrElse(
      status(spark, root).orderBy(desc("round")).limit(1)
        .collect().headOption.map(_.getAs[Long]("seenSize")).getOrElse(0L))
    Seq((fSize > 0, r, fSize, seenSz))
      .toDF("is_running", "round", "frontier_size", "seen_size")
  }

  /** The reference's `in_progress` list (gcloud_master.py:197-207): URLs
   * dispatched but not yet resolved. At a committed BSP round boundary
   * this is empty BY CONSTRUCTION — every dispatched URL resolves within
   * its round before the commit — so the projection exists for API parity
   * and always returns zero rows (with the reference's schema). */
  def inProgress(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    // same root validation as every sibling projection: a nonexistent or
    // uncommitted crawl is an error, not an empty success
    new SnapshotTable(root).latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    Seq.empty[(String, String, Long)].toDF("url", "host", "seq")
  }

  /** The reference's `recently_added` tail (templates/app.py:572-601):
   * the n most recently admitted still-queued URLs — the frontier's top
   * seq values (seq is the global admission order). */
  def recentlyAdded(spark: SparkSession, root: String, n: Int = 5): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    liveFrontier(spark, snap, r)
      .orderBy(desc("seq")).limit(n)
      .select("url", "host", "depth", "seq")
  }

  /** The LIVE frontier at a committed round: the raw hybrid view filtered
   * by the dispatch-prefix liveness predicate (abs-rank snapshots), or the
   * replace-format table as-is (legacy snapshots hold live rows only). */
  private def liveFrontier(spark: SparkSession, snap: SnapshotTable,
                           r: Int): DataFrame = {
    val raw = snap.loadHybrid(spark, "frontier", r)
    if (snap.meta(r).get("frontierAbsRank").contains("1"))
      liveRows(raw, snap.loadReplaced(spark, "host_sched", r))
    else raw
  }

  /** Raw-page point lookup (J6, /get_html — templates/app.py:807-904):
   * exact url key against the pages store; the equality predicate reaches
   * the parquet scan (footer min/max pruning). */
  def getPage(spark: SparkSession, root: String, url: String): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    snap.loadAppendedOr(spark, "pages", r, PagesDdl)
      .where(col("url") === url)
      .select("round", "url", "content_type", "raw")
  }

  /** /check_url (templates/app.py:906-1015): exact match plus fuzzy
   * contains-matches on a scheme-/slash-normalized needle, tagged by kind. */
  def checkUrl(spark: SparkSession, root: String, url: String): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    val needle = url.replaceFirst("^https?://", "").stripSuffix("/")
    val pages = snap.loadAppendedOr(spark, "pages", r, PagesDdl)
      .select("round", "url", "content_type")
    pages.where(col("url") === url).withColumn("match_kind", lit("exact"))
      .unionByName(
        pages.where(col("url") =!= url && col("url").contains(needle))
          .withColumn("match_kind", lit("fuzzy")))
      .orderBy(col("match_kind"), col("url"))
  }

  /** Search the PERSISTED postings table (T8/S9 — no index recompute:
   * gcloud_indexer.py:271-327 snapshots, :356-366 appends) and attach a
   * leading-text snippet (C8, :340) by joining doc_store for the k result
   * rows only. */
  def searchStore(spark: SparkSession, root: String, query: String,
                  field: String = "content", k: Int = 10): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    val postings = snap.loadAppendedOr(spark, "postings", r, PostingsDdl)
      .select("term", "url", "weight", "title")
    val top = SearchIndex.search(postings, query, field, k)
    val docs = snap.loadAppendedOr(spark, "doc_store", r, DocStoreDdl)
      .select("url", "text")
    top.join(docs, Seq("url"), "left_outer")
      .withColumn("snippet",
        concat(substring(coalesce(col("text"), lit("")), 1, 200), lit("...")))
      .select("url", "score", "title", "snippet")
      .orderBy(desc("score"), asc("url"))
  }

  /** Per-worker (executor partition) processed/completed counters with the
   * round as heartbeat clock (A4/T7, gcloud_master.py:702-725). */
  def workerStats(spark: SparkSession, root: String): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    snap.loadAppendedOr(spark, "worker_stats", r, WorkerStatsDdl)
      .groupBy("part_id")
      .agg(sum("processed").as("processed"), sum("completed").as("completed"),
        sum("links_found").as("links_found"), max("round").as("last_heartbeat_round"))
      .orderBy("part_id")
  }

  /** Recent-activity tail (O3, templates/app.py:572-576): last n completed
   * fetches in dispatch order. */
  def recentActivity(spark: SparkSession, root: String, n: Int = 5): DataFrame = {
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state"))
    snap.loadAppendedOr(spark, "fetch_log", r, FetchLogDdl)
      .where(col("status").isin("ok", "ok_non_html"))
      .orderBy(desc("round"), desc("seq")).limit(n)
      .select("round", "url", "status")
  }

  /**
   * reset-failures (D4, cli.py:194-231 / templates/app.py:1207-1292):
   * re-open terminally-failed URLs, committed as a new round boundary so a
   * subsequent run() resumes from the reset state.
   *
   *  - `forget = false` (reference-faithful): failed URLs re-enter the
   *    frontier at the back of the queue (membership-checked against the
   *    current frontier, retry counter reset), `failed` is cleared, `seen`
   *    is untouched — exactly the reference's move-failed-to-queue loop.
   *  - `forget = true` (the deletable-seen flow the north rule's cuckoo
   *    filter exists for): failed URLs are REMOVED from the seen set, the
   *    seen sketch (cuckoo: exact per-entry deletes; bloom: forced 4x-
   *    amortized rebuild from the shrunken seen table), the per-host
   *    enqueue counts, and `failed` — so the crawl re-admits them
   *    organically the next time any page links to them.
   *
   * Returns the number of URLs re-opened.
   */
  def resetFailures(spark: SparkSession, root: String, cfg: CrawlConfig,
                    forget: Boolean = false): Long = {
    import spark.implicits._
    val snap = new SnapshotTable(root)
    val r = snap.latestRound.getOrElse(
      throw new IllegalStateException("no crawl state to reset"))
    val m0 = snap.meta(r)
    val nextSeq = m0("nextSeq").toLong
    // frontier views (LSM): raw = base + delta tiers with absolute ranks
    // (legacy replace-format snapshots are normalized here, once); live =
    // rows past the per-host dispatch prefix
    val absFmt = m0.get("frontierAbsRank").contains("1")
    val sched = snap.loadReplaced(spark, "host_sched", r)
    val frontierRaw0 = snap.loadHybrid(spark, "frontier", r)
    val frontierRaw = if (absFmt) frontierRaw0 else toAbsRanks(frontierRaw0, sched)
    val live = if (absFmt) liveRows(frontierRaw, sched) else frontierRaw
    val hostEnq = if (absFmt) snap.loadReplaced(spark, "host_enq", r)
      else live.groupBy("host").agg(count(lit(1)).as("enq"))
        .join(sched, Seq("host"), "full_outer")
        .select(col("host"), (coalesce(col("enq"), lit(0L)) +
          coalesce(col("dispatched"), lit(0L))).as("enq"))
    val seen = snap.loadHybrid(spark, "seen", r)
    val hostCounts = snap.loadReplaced(spark, "host_counts", r)
    val failedTbl = snap.loadHybrid(spark, "failed", r)
      .groupBy("url")
      .agg(min(struct(col("seq"), col("host"), col("depth"))).as("m"))
      .select(col("url"), col("m.host").as("host"), col("m.depth").as("depth"),
        col("m.seq").as("seq"))
      .localCheckpoint(true)
    val n = failedTbl.count()
    if (n == 0) return 0L

    var sketch = snap.loadBlob("seen_sketch", r)
      .flatMap(b => scala.util.Try(
        graft.functions.SeenSketch.deserialize(b)).toOption)
      .getOrElse(graft.functions.SeenSketch.build(seen, "url",
        cfg.seenSketch, cfg.sketchCapacity))
    val emptyFailed = Seq.empty[(String, String, Int, Int, Long, String)]
      .toDF("url", "host", "depth", "retry", "seq", "error")

    val priorSeenSize = m0.get("seenSize").map(_.toLong)
    val (entriesOpt, newSeen, newHostCounts, newHostEnq, reopened) =
      if (!forget) {
        // queue-membership-checked append at the back (cli.py:217-219):
        // membership is against the LIVE frontier (a failed URL's dead raw
        // row is its past dispatch, not queue membership)
        val toRetry = failedTbl.join(live, Seq("url"), "left_anti")
          .select(col("url"), col("host"), col("depth"),
            lit(0).as("retry"), col("seq").as("ord1"), lit(0).as("ord2"))
        // reopened entries queue behind everything the host ever enqueued:
        // batch-local rank (reset-time window over the reopened set only)
        // + the per-host enqueue totals
        val entries = assignSeq(spark, toRetry,
          Seq(col("ord1"), col("ord2")), nextSeq)
          .withColumn("host_rank", row_number()
            .over(Window.partitionBy(col("host")).orderBy(col("seq"))).cast(LongType))
          .join(hostEnq, Seq("host"), "left_outer")
          .withColumn("host_rank", col("host_rank") + coalesce(col("enq"), lit(0L)))
          .select("url", "host", "depth", "retry", "seq", "host_rank")
          .localCheckpoint(true)
        val entryCounts = entries.groupBy("host").agg(count(lit(1)).as("add_"))
        val enq2 = hostEnq.join(entryCounts, Seq("host"), "full_outer")
          .select(col("host"), (coalesce(col("enq"), lit(0L)) +
            coalesce(col("add_"), lit(0L))).as("enq"))
        (Some(entries), seen, hostCounts, enq2, entries.count())
      } else {
        val shrunk = seen.join(failedTbl.select("url"), Seq("url"), "left_anti")
          .localCheckpoint(true)
        // cuckoo: exact distributed deletes — executor-built shards of the
        // failed URLs subtracted from the filter driver-side, O(failed)
        // spread across the cluster (the delete mirror of the addAll
        // maintenance path; no per-row driver loop). Bloom (not deletable)
        // or an inconsistent delete (entry missing — the sketch was not in
        // sync with `seen`) falls back to the 4x-amortized rebuild from
        // the shrunken seen table.
        val deleted = graft.functions.SeenSketch.deleteAll(
          sketch, failedTbl.select("url"), "url")
        if (!deleted) {
          var cap = math.max(sketch.capacity, cfg.sketchCapacity)
          do {
            sketch = graft.functions.SeenSketch.build(shrunk, "url", sketch.kind, cap)
            cap *= 4
          } while (sketch.saturated)
        }
        // inverse of admission: give the hosts their cap budget back.
        // host_enq is NOT decremented — it is a rank high-water mark, not
        // a budget; shrinking it would collide future absolute ranks.
        val dec = failedTbl.groupBy("host").agg(count(lit(1)).as("dec"))
        val counts = hostCounts.join(dec, Seq("host"), "left_outer")
          .select(col("host"),
            greatest(col("cnt") - coalesce(col("dec"), lit(0L)), lit(0L)).as("cnt"))
        (None, shrunk, counts, hostEnq, n)
      }

    // frontier commit shape (LSM): on an abs-format snapshot, requeue mode
    // APPENDS the reopened entries as a delta tier and forget mode writes
    // nothing at all; a legacy snapshot is normalized by ONE replace with
    // the converted live rows (∪ entries). host_enq rides along: carried
    // when untouched, replaced otherwise.
    val frontierAppend: Map[String, DataFrame] =
      if (absFmt && entriesOpt.isDefined && reopened > 0)
        Map("frontier" -> entriesOpt.get)
      else Map.empty
    val frontierReplace: Map[String, DataFrame] =
      if (!absFmt)
        Map("frontier" -> entriesOpt.fold(frontierRaw)(frontierRaw.unionByName))
      else Map.empty
    val enqChanged = !absFmt || (entriesOpt.isDefined && reopened > 0)
    // requeue mode leaves `seen` untouched (no commit entry — prior appends
    // stay visible); forget mode REPLACES it with the shrunken set, which
    // doubles as a compaction point for the hybrid append chain. Both modes
    // CLEAR the quarantine (the reference's clear_problematic_domains flag
    // rides the same reset flow, gcloud_crawler.py:770-790).
    snap.commit(spark, r + 1,
      replaced = Map(
        "host_counts" -> newHostCounts,
        "failed" -> emptyFailed, // replace = the hybrid chain's compaction point
        "quarantined" -> Seq.empty[String].toDF("host")) ++
        (if (forget) Map("seen" -> newSeen) else Map.empty) ++
        frontierReplace ++
        (if (enqChanged) Map("host_enq" -> newHostEnq) else Map.empty),
      appended = frontierAppend,
      // stamp frontierSize/seenSize like the crawl-round commits do, so
      // statusSummary reads one consistent source: prior size (stamped by
      // the previous commit; counted once for pre-stamping snapshots) plus
      // the reopened set in requeue mode
      meta = Map(
        "nextSeq" -> (nextSeq + (if (forget) 0L else reopened)).toString,
        "frontierSize" -> (m0.get("frontierSize").map(_.toLong)
          .getOrElse(live.count()) + (if (forget) 0L else reopened)).toString,
        // seen shrinks by exactly the reopened set in forget mode (every
        // failed URL was admitted, hence in seen) and is untouched otherwise
        "seenSize" -> (priorSeenSize.getOrElse(seen.count())
          - (if (forget) n else 0L)).toString,
        "frontierAbsRank" -> "1"),
      blobs = Map("seen_sketch" -> graft.functions.SeenSketch.serialize(sketch)),
      bucketed = Map("frontier" ->
        pmod(xxhash64(col("host")), lit(graft.plans.SnapshotTable.Buckets))),
      carried = Map("host_sched" -> r) ++ // dispatch history unchanged by a reset
        (if (enqChanged) Map.empty[String, Int] else Map("host_enq" -> r)))
    reopened
  }
}
