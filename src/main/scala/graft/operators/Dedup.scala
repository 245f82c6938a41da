package graft.operators

import graft.functions.{gf, sketch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Content-level deduplication for training-data pipelines, each shaped for
 * the 100 TB path:
 *
 *  - exact:      hash-groupBy on normalized text (one shuffle, partial agg)
 *  - minhashLSH: shingle → one-pass MinHash signature (custom expression)
 *                → band → bucket self-join → exact-Jaccard verification.
 *                Shuffle volume is O(bands · docs) small fixed-width rows;
 *                the wide shingle arrays are joined back only for the
 *                (tiny) candidate set. LSH misses nothing a bucket shares;
 *                verification makes every emitted pair exactly true.
 *  - simhash:    64-bit fingerprint (custom expression) + Manku
 *                block-combination tables: any pair within the hamming
 *                radius shares all blocks of some combination (pigeonhole),
 *                so a bucket self-join over one shared exchange +
 *                bit_count verify + first-clean-table dedup is exact —
 *                with no distinct() exchange anywhere.
 *  - jaccardBrute: exact all-pairs (the small-scale oracle / baseline).
 */
object Dedup {

  /** Word n-gram shingles of a text column, as array<string>.
   * NOTE: this HOF form is the readable/debuggable variant — lambda HOFs
   * are interpreted (no whole-stage codegen) and re-evaluate `text`'s
   * tokenizer per element; every hot path below uses the one-pass hashed
   * form [[graft.functions.sketch.shingle_hash64]] instead. */
  def shingles(text: Column, n: Int): Column = {
    val toks = gf.tokenize(text)
    // slide over token indices: shingle i = tokens[i..i+n-1] joined
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(i + n <= size(toks),
          array_join(slice(toks, i + 1, lit(n)), " "))),
      s => s.isNotNull)
  }

  /** Distinct hashed n-gram shingle set — the hot-path form: tokenizer
   * runs once per row, the window hashing is one codegen'd pass, and all
   * downstream set math (minhash, Jaccard) runs on longs. */
  def hashedShingles(text: Column, n: Int): Column =
    sketch.shingle_hash64(gf.tokenize(text), n)

  /** Exact dedup: keep min(id) per identical normalized text. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(regexp_replace(lower(col(text)), "\\s+", " ").as("norm_text"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("dupes"))

  /** Scale-adaptive fan-out for CPU-heavy per-row stages (fingerprinting,
   * signature building): when the upstream scan yields fewer partitions
   * than the session has cores (small/single-file inputs — a 100 TB table
   * always scans wider than the core count), spread the rows first so the
   * per-row work parallelizes. A no-op exactly when the input is already
   * at least core-parallel, so no shuffle is ever added at scale; results
   * are row-wise deterministic, so placement cannot change any output. */
  private[operators] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Size-derived shuffle width (guide §2.2: fewer, larger partitions):
   * Catalyst's size estimate for `df`, times a row `fanout` factor the
   * caller knows (e.g. table multiplicity), over a 64 MB target — floored
   * at core parallelism. At bench scale this keeps a kB-sized exchange at
   * core width instead of the session's fixed shuffle partitioning; at
   * 100 TB the bytes term dominates and the width scales with the data. */
  private[operators] def adaptiveWidth(df: DataFrame, fanout: Double): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble * fanout
    val byBytes = math.ceil(est / (64L << 20).toDouble).toLong
    math.max(df.sparkSession.sparkContext.defaultParallelism,
      math.min(byBytes, 1L << 20)).toInt
  }

  /**
   * MinHash+LSH near-dup pairs with exact verification.
   * Emits (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold,
   * over candidates that collide in ≥1 of `bands` bands of `rows` rows
   * (k = bands·rows signature). Detection probability at similarity s is
   * 1-(1-s^rows)^bands — at the defaults (32×4) ≈ 1-5e-8 for s = 0.8.
   */
  def minhashLSH(df: DataFrame, id: String, text: String,
                 n: Int = 3, bands: Int = 32, rows: Int = 4,
                 threshold: Double = 0.8): DataFrame = {
    // shingle ONCE into 64-bit hashes and drop the strings immediately:
    // signatures, banding, and exact verification all run over the hashed
    // sets (jaccard over 64-bit hashed distinct sets == jaccard over the
    // string sets up to a ~1e-15 collision). Materialized via an EAGER
    // local checkpoint so banding and verification share one shingling pass.
    // r6: the k-permutation signature and the per-band bucket keys fuse
    // into ONE expression (minhash_band_hashes) — the former pipeline
    // materialized a k-long signature array and then ran an INTERPRETED
    // transform(sequence…, xxhash64(slice…)) per band; band keys are opaque
    // bucket identities, so the fused keys change nothing the LSH consumes.
    // fanOut first: signature building is the operator's CPU-dominant
    // per-row stage, and a single-file input would otherwise pin it to one
    // core (no-op at scale).
    val withSig = fanOut(df.select(col(id).as("doc"), col(text).as("txt")))
      .select(col("doc"), hashedShingles(col("txt"), n).as("hs"))
      .withColumn("bh", sketch.minhash_band_hashes(col("hs"), bands, rows))
      .localCheckpoint(true) // eager: banding + verification both read it

    // band → bucket key; only (doc, band, hash) goes through the shuffle
    val banded = withSig.select(
      col("doc"), posexplode(col("bh")).as(Seq("band", "bhash")))

    val l = banded.select(col("band"), col("bhash"), col("doc").as("id_a"))
    val r = banded.select(col("band"), col("bhash"), col("doc").as("id_b"))
    // candidate-pair dedup width is size-derived (r6, guide §2.2): the
    // distinct's exchange otherwise comes out at the session's fixed
    // shuffle width — 128 near-empty reduce tasks for a kB-scale candidate
    // stream at bench scale; bytes-proportional at 100 TB. The pair stream
    // is bounded by the banded stream (bands× the doc table), so the same
    // estimate serves. The explicit repartition replaces distinct's own
    // exchange (the aggregate sees its distribution satisfied), trading
    // map-side partial dedup for the controlled width — a duplicate pair's
    // copies come from DIFFERENT bands, which the (band, bhash)-partitioned
    // join output scatters across partitions, so partial dedup before the
    // exchange had (almost) nothing to collapse anyway.
    val candidates = l.join(r, Seq("band", "bhash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .repartition(adaptiveWidth(df, bands.toDouble), col("id_a"), col("id_b"))
      .distinct()

    // exact verification on the candidate set only — sort-merge Jaccard
    // over the hashed sets in one codegen'd expression
    val sets = withSig.select(col("doc"), col("hs"))
    candidates
      .join(sets.select(col("doc").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(sets.select(col("doc").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("jaccard", sketch.jaccard_long(col("hs_a"), col("hs_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs, exact for hamming ≤ maxHamming, via
   * Manku-style block-combination tables (Manku/Jain/Das Sarma,
   * "Detecting Near-Duplicates for Web Crawling", WWW 2007 — public
   * algorithm): split the 64-bit fingerprint into `blocks` nearly-equal
   * blocks; for every combination of m = blocks − maxHamming blocks, one
   * table keys each doc on the CONCATENATION of those blocks. Any pair
   * within hamming ≤ maxHamming has its errors in ≤ maxHamming blocks, so
   * some m clean blocks exist and the pair collides in that table —
   * exactness by pigeonhole, same as chunk-equality buckets, but on keys
   * m× wider (defaults: C(6,3) = 20 tables keyed on ~32 bits instead of 4
   * tables on 16 bits).
   *
   * Why this shape at scale: on a shared-vocabulary corpus (the
   * reference's own field data is one host + one template) fingerprints
   * cluster, and 16-bit chunk buckets collide FAR-apart docs by the
   * million — the bucket join goes quadratic. A ~32-bit key makes a
   * chance (non-near-dup) collision ~2^16× rarer per table, so bucket
   * population tracks the true near-dup density; the price is a fixed
   * 20×-vs-4× fan-out of narrow (tbl, key, doc) rows through the shuffle,
   * Manku's trade. For corpora beyond ~10^8 docs raise `blocks` (e.g.
   * blocks = 8 with maxHamming = 3 → C(8,5) = 56 tables on ~40-bit keys). */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   maxHamming: Int = 3, blocks: Int = 6): DataFrame = {
    // fingerprints are computed ONCE even without materialization: the
    // single shared exchange below is the only consumer of this lineage
    // (both self-join sides reuse it, and the hamming verify reads sims
    // carried through the shuffle), so tokenize+simhash runs exactly once
    // per doc — the r3 eager checkpoint became pure overhead and is gone.
    // fanOut first (r6): the tokenize+simhash map runs BEFORE the shared
    // exchange, i.e. at the scan's parallelism — a single-file input would
    // serialize the whole fingerprint pass on one core (no-op at scale).
    simhashPairsFromFp(fanOut(df.select(col(id).as("doc"), col(text).as("txt_")))
      .select(col("doc"), sketch.simhash64(gf.tokenize(col("txt_"))).as("sim")),
      maxHamming, blocks)
  }

  /** The Manku bucket machinery over PRE-COMPUTED 64-bit fingerprints
   * (columns: doc, sim). Split out so the table-key construction,
   * pigeonhole bucket join, and first-clean-table dedup can be
   * oracle-checked against a brute-force hamming join over the same
   * fingerprint column (q_dedup_simhash_sql) — the text→simhash expression
   * itself is covered by DedupSpec's brute-force equality. */
  def simhashPairsFromFp(fp: DataFrame,
                         maxHamming: Int = 3, blocks: Int = 6): DataFrame = {
    require(blocks > maxHamming && blocks <= 16,
      s"need maxHamming < blocks <= 16, got maxHamming=$maxHamming blocks=$blocks")
    val m = blocks - maxHamming
    val nTables = (0 until blocks).combinations(m).size
    require(nTables <= 128,
      s"C($blocks, $m) = $nTables tables — pick parameters with <= 128")

    // all table keys from ONE array-producing expression (block widths/
    // offsets/combinations resolved inside SketchCodegen): the session
    // compiles a single call site instead of nTables independent
    // shift/mask column trees — same keys, ~nTables× less codegen for the
    // per-query compile (the suite-clock cost the plan itself never had)
    val keyed = fp.select(col("doc"), col("sim"),
      posexplode(sketch.simhash_table_keys(col("sim"), blocks, maxHamming))
        .as(Seq("tbl", "key")))
      // ONE explicit exchange on the join keys, shared by both self-join
      // sides (identical child plans → ReusedExchange): the join reads the
      // existing hash distribution instead of building two exchanges.
      // Width is size-derived (r6): the keyed stream is nTables× the
      // fingerprint table's bytes — core-parallel at bench scale instead
      // of the session's fixed width, bytes-proportional at 100 TB.
      .repartition(adaptiveWidth(fp, nTables.toDouble), col("tbl"), col("key"))
    val l = keyed.select(col("tbl"), col("key"),
      col("doc").as("id_a"), col("sim").as("sim_a"))
    val r = keyed.select(col("tbl"), col("key"),
      col("doc").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("tbl", "key"))
      .where(col("id_a") < col("id_b"))
      .withColumn("xor_", col("sim_a").bitwiseXOR(col("sim_b")))
      .withColumn("hamming", bit_count(col("xor_")))
      .where(col("hamming") <= maxHamming)
      // DISTINCT-FREE pair dedup: a within-radius pair collides in every
      // table whose block combination is clean for it — keep the candidate
      // only in the FIRST clean table (a pure function of the fingerprint
      // XOR), so each pair is emitted exactly once with no dedup exchange.
      // At scale this removes the shuffle of the whole candidate set that
      // distinct() would pay; chance (far-pair) collisions died at the
      // hamming filter just above, before any further data movement.
      .where(col("tbl") === sketch.simhash_first_table(col("xor_"), blocks, maxHamming))
      .select("id_a", "id_b", "hamming")
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold (baseline / oracle path;
   * quadratic — small inputs only). Set math over hashed shingles:
   * identical to the string-set Jaccard up to 64-bit collisions. */
  def jaccardBrute(df: DataFrame, id: String, text: String,
                   n: Int = 3, threshold: Double = 0.15): DataFrame = {
    // fanOut (r6): both the shingling map and — more importantly — the
    // LEFT side of the pair crossJoin below inherit this partitioning, so
    // a single-partition input would otherwise verify every pair in one
    // task (no-op at scale)
    val sets = fanOut(df.select(col(id).as("doc"), col(text).as("txt_")))
      .select(col("doc"), hashedShingles(col("txt_"), n).as("hs"))
      .localCheckpoint(true) // both crossJoin sides read it
    val a = sets.select(col("doc").as("id_a"), col("hs").as("hs_a"))
    val b = sets.select(col("doc").as("id_b"), col("hs").as("hs_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("jaccard", sketch.jaccard_long(col("hs_a"), col("hs_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-dup pairs via LSH buckets + exact cosine verify. */
  def embeddingDupes(df: DataFrame, id: String, vecCol: String,
                     threshold: Double = 0.95, bits: Int = 12): DataFrame = {
    import graft.functions.vec
    val sig = df.select(col(id).as("doc"), col(vecCol).as("v"))
      .withColumn("bucket", vec.rhp_sig(col("v"), bits))
    val l = sig.select(col("bucket"), col("doc").as("id_a"), col("v").as("v_a"))
    val r = sig.select(col("bucket"), col("doc").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", vec.cosine_sim(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
