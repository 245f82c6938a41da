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
 *  - simhash:    64-bit fingerprint (custom expression) + banded hamming
 *                join: split 64 bits into `tables` chunks; any pair within
 *                hamming ≤ tables-1 shares at least one chunk (pigeonhole),
 *                so bucket-join on chunks + bit_count verify is exact.
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
    val k = bands * rows
    // shingle ONCE into 64-bit hashes and drop the strings immediately:
    // signatures, banding, and exact verification all run over the hashed
    // sets (jaccard over 64-bit hashed distinct sets == jaccard over the
    // string sets up to a ~1e-15 collision). Materialized (lazy local
    // checkpoint) so banding and verification share one shingling pass.
    val withSig = df.select(
      col(id).as("doc"),
      hashedShingles(col(text), n).as("hs"))
      .withColumn("sig", sketch.minhash_sig(col("hs"), k))
      .localCheckpoint(true) // eager: banding + verification both read it


    // band → bucket key; only (doc, band, hash) goes through the shuffle
    val banded = withSig.select(
      col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bhash")))

    val l = banded.select(col("band"), col("bhash"), col("doc").as("id_a"))
    val r = banded.select(col("band"), col("bhash"), col("doc").as("id_b"))
    val candidates = l.join(r, Seq("band", "bhash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

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

  /** SimHash near-dup pairs: exact for hamming ≤ tables-1 by pigeonhole
   * over `tables` 16-bit chunks of the 64-bit fingerprint.
   *
   * Skew caveat: on a corpus whose documents share one vocabulary
   * distribution, simhash values cluster and some chunk buckets go
   * quadratic (the candidate join is the dominant cost — exactness
   * requires examining every colliding pair). For such corpora MinHash
   * over shingles (content sets, not frequency votes) separates far
   * better — it is the primary near-dup path here; simhash is kept for
   * its hamming-distance semantics. */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   maxHamming: Int = 3, tables: Int = 4): DataFrame = {
    require(64 % tables == 0 && maxHamming < tables)
    val width = 64 / tables
    val fp = df.select(col(id).as("doc"),
      sketch.simhash64(gf.tokenize(col(text))).as("sim"))
    val chunked = fp.select(col("doc"), col("sim"),
      posexplode(array((0 until tables).map(t =>
        shiftrightunsigned(col("sim"), t * width)
          .bitwiseAND(lit((1L << width) - 1))): _*)).as(Seq("tbl", "chunk")))
    val l = chunked.select(col("tbl"), col("chunk"),
      col("doc").as("id_a"), col("sim").as("sim_a"))
    val r = chunked.select(col("tbl"), col("chunk"),
      col("doc").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("tbl", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      // filter BEFORE the dedup shuffle: (id_a,id_b) determines hamming, so
      // the order is semantically free, and far-apart pairs (the bulk of
      // correlated-chunk collisions) never enter the distinct exchange
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold (baseline / oracle path;
   * quadratic — small inputs only). Set math over hashed shingles:
   * identical to the string-set Jaccard up to 64-bit collisions. */
  def jaccardBrute(df: DataFrame, id: String, text: String,
                   n: Int = 3, threshold: Double = 0.15): DataFrame = {
    val sets = df.select(col(id).as("doc"), hashedShingles(col(text), n).as("hs"))
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
