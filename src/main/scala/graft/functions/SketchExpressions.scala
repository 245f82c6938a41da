package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sketch primitives for content dedup at scale: one-pass MinHash
 * signatures and SimHash fingerprints as native Catalyst expressions
 * (preferred over UDFs — SURVEY.md §2.9 preference order). Both consume a
 * pre-tokenized/shingled array so tokenization stays in codegen'd
 * built-ins; the expression does only the tight numeric loop.
 *
 * Hashing is splitmix64 over xxhash-style avalanche (public-domain
 * constants), seeded per permutation index — deterministic across
 * partitions, sessions, and parallelism.
 */
object SketchCodegen {

  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def hash64(s: UTF8String): Long = {
    // FNV-1a over bytes, finalized with splitmix — stable across JVMs
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001B3L; i += 1 }
    mix64(h)
  }

  /** k min-hash values over the shingle array, one pass per permutation
   * family via seed mixing: sig_j = min_i mix(shingle_i ^ seed_j). */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val seed = mix64(0x5EEDB00C + j.toLong)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = mix64(shingles.getLong(i) ^ seed)
        if (v < m) m = v
        i += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Per-(bands, rows) permutation-family constants, resolved once per
   * parameterization (process-wide cache): odd multipliers + offsets of a
   * 2-universal affine family v_j(x) = a_j·x + b_j (mod 2^64). Inputs are
   * already-avalanched 64-bit shingle hashes, so the affine map's ranking
   * is as good a permutation approximation as the previous
   * mix64(x ^ seed_j) at a third of the per-(shingle, perm) cost. */
  private final class MinhashPlan(k: Int) {
    val a: Array[Long] = Array.tabulate(k)(j => mix64(0x5EEDB00C + j.toLong) | 1L)
    val b: Array[Long] = Array.tabulate(k)(j => mix64(0xB00C5EED - j.toLong))
  }
  private val minhashPlans =
    new java.util.concurrent.ConcurrentHashMap[Int, MinhashPlan]()

  /** The `bands` LSH band keys of a doc's hashed shingle set in ONE pass:
   * k = bands·rows min-hash minima (affine family, shingle-outer loop so
   * each shingle hash is read once and the k minima stay in cache), then
   * each band's `rows` consecutive minima fold into one 64-bit key.
   * Fuses the former minhash_sig (k-element signature array) +
   * per-band interpreted `transform(sequence…, xxhash64(slice…))` pipeline
   * into a single codegen'd call — band keys differ from the old ones as
   * VALUES (both are opaque bucket keys; collision-in-band probability,
   * the only thing LSH consumes, is unchanged), so the verified pair set
   * is identical. */
  def minhashBandHashes(shingles: ArrayData, bands: Int, rows: Int): ArrayData = {
    val k = bands * rows
    val plan = minhashPlans.computeIfAbsent(k, kk => new MinhashPlan(kk))
    val a = plan.a
    val b = plan.b
    val n = shingles.numElements()
    val m = new Array[Long](k)
    java.util.Arrays.fill(m, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = shingles.getLong(i)
      var j = 0
      while (j < k) {
        val v = a(j) * x + b(j)
        if (v < m(j)) m(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var bd = 0
    while (bd < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) { acc = acc * 1000003L + m(bd * rows + r); r += 1 }
      out(bd) = mix64(acc)
      bd += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over token array: per-bit vote of token hashes. */
  def simhash(tokens: ArrayData, numElementsIgnored: Int): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(tokens.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Polynomial rolling hash over the token sequence (wrapping mod 2^64) —
   * order-sensitive, unlike a content-set hash. */
  def rollingHash(tokens: ArrayData, numElementsIgnored: Int): Long = {
    val n = tokens.numElements()
    var h = 0L
    var i = 0
    while (i < n) { h = h * 1000003L + hash64(tokens.getUTF8String(i)); i += 1 }
    h
  }

  /** Stable 64-bit content hash of each string element. */
  def hashArray(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = hash64(tokens.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct hashed word-n-gram shingles in ONE pass: hash each token
   * once, combine each n-window order-sensitively (polynomial + avalanche),
   * sort + unique. Replaces the HOF pipeline
   * `array_distinct(transform(sequence…, slice+array_join))`, which (a)
   * falls out of whole-stage codegen (lambda HOFs are interpreted) and (b)
   * re-evaluates the tokenizer child for EVERY array element — ~2 regex
   * tokenizations per shingle. Jaccard over these hashed sets equals
   * Jaccard over the string shingle sets up to 64-bit collisions. */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    val m = math.max(0, cnt - n + 1)
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) { th(i) = hash64(tokens.getUTF8String(i)); i += 1 }
    val w = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < n) { h = h * 1000003L + th(i + j); j += 1 }
      w(i) = mix64(h)
      i += 1
    }
    java.util.Arrays.sort(w)
    var out = 1
    i = 1
    while (i < m) {
      if (w(i) != w(i - 1)) { w(out) = w(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(w, out))
  }

  /** Per-(blocks, maxHamming) precomputed Manku table-key plan: block bit
   * widths/offsets and the C(blocks, blocks−maxHamming) block
   * combinations, resolved once per parameterization (process-wide cache)
   * so the per-row loop is pure shifts and masks. */
  private final class SimhashKeyPlan(blocks: Int, maxHamming: Int) {
    val widths: Array[Int] =
      Array.tabulate(blocks)(i => 64 / blocks + (if (i < 64 % blocks) 1 else 0))
    val offsets: Array[Int] = widths.scanLeft(0)(_ + _)
    val masks: Array[Long] =
      widths.map(w => if (w >= 64) -1L else (1L << w) - 1)
    val combos: Array[Array[Int]] =
      (0 until blocks).combinations(blocks - maxHamming).map(_.toArray).toArray
    // per-combination fingerprint mask: the 64-bit region a combination's
    // blocks cover — a pair collides in table t iff (xor & comboMasks(t)) == 0
    val comboMasks: Array[Long] =
      combos.map(c => c.map(b => masks(b) << offsets(b)).reduce(_ | _))
  }
  private val simhashPlans =
    new java.util.concurrent.ConcurrentHashMap[Int, SimhashKeyPlan]()

  /** All C(blocks, blocks−maxHamming) Manku block-combination table keys
   * of a 64-bit simhash fingerprint, in one pass (key t = concatenated
   * bits of combination t's blocks — identical to folding shift/or per
   * block, but emitted by ONE expression instead of one column tree per
   * table, so the session compiles a single codegen call site however
   * many tables the parameterization implies). */
  def simhashTableKeys(sim: Long, blocks: Int, maxHamming: Int): ArrayData = {
    val plan = simhashPlans.computeIfAbsent(blocks * 64 + maxHamming,
      _ => new SimhashKeyPlan(blocks, maxHamming))
    val combos = plan.combos
    val out = new Array[Long](combos.length)
    var t = 0
    while (t < combos.length) {
      val c = combos(t)
      var acc = 0L
      var j = 0
      while (j < c.length) {
        val b = c(j)
        acc = (acc << plan.widths(b)) | ((sim >>> plan.offsets(b)) & plan.masks(b))
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Index of the FIRST Manku table whose blocks are all clean for a pair
   * with fingerprint XOR `x` (i.e. the combination's covered bits carry no
   * error). Any pair within hamming ≤ maxHamming has ≥ 1 clean
   * combination and collides in EVERY clean combination's table — so
   * keeping a joined candidate only when its table IS the first clean one
   * emits each pair exactly once, with no distinct() exchange at all.
   * Returns -1 when no combination is clean (pair beyond the radius —
   * already removed by the hamming filter). */
  def simhashFirstTable(x: Long, blocks: Int, maxHamming: Int): Int = {
    val plan = simhashPlans.computeIfAbsent(blocks * 64 + maxHamming,
      _ => new SimhashKeyPlan(blocks, maxHamming))
    val masks = plan.comboMasks
    var t = 0
    while (t < masks.length) {
      if ((x & masks(t)) == 0L) return t
      t += 1
    }
    -1
  }

  /** Exact Jaccard of two DISTINCT-element long arrays (hashed shingle
   * sets): sort-merge intersection count, no per-element boxing or hash
   * set — the candidate-verification hot loop of MinHash LSH. */
  def jaccardLong(a: ArrayData, b: ArrayData): Double = {
    val la = a.toLongArray()
    val lb = b.toLongArray()
    java.util.Arrays.sort(la)
    java.util.Arrays.sort(lb)
    var i = 0; var j = 0; var inter = 0
    while (i < la.length && j < lb.length) {
      val x = la(i); val y = lb(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = la.length + lb.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** minhash_sig(shingle_hashes: array<long>, k) → array<long>[k] */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(arr: Any): Any =
    SketchCodegen.minhash(arr.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchCodegen.minhash($a, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** minhash_band_hashes(shingle_hashes: array<long>, bands, rows) →
 * array<long>[bands]: fused min-hash signature + LSH band keys (see
 * SketchCodegen.minhashBandHashes). */
case class MinHashBandHashes(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(arr: Any): Any =
    SketchCodegen.minhashBandHashes(arr.asInstanceOf[ArrayData], bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SketchCodegen.minhashBandHashes($a, $bands, $rows)")
  override protected def withNewChildInternal(c: Expression): MinHashBandHashes =
    copy(child = c)
  override def prettyName: String = "minhash_band_hashes"
}

/** simhash64(tokens: array<string>) → long */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(arr: Any): Any =
    SketchCodegen.simhash(arr.asInstanceOf[ArrayData], 0)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchCodegen.simhash($a, 0)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** rolling_hash64(tokens: array<string>) → long (order-sensitive) */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(arr: Any): Any =
    SketchCodegen.rollingHash(arr.asInstanceOf[ArrayData], 0)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchCodegen.rollingHash($a, 0)")
  override protected def withNewChildInternal(c: Expression): RollingHash64 = copy(child = c)
  override def prettyName: String = "rolling_hash64"
}

/** shingle_hash64(tokens: array<string>, n) → sorted distinct array<long> */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(arr: Any): Any =
    SketchCodegen.shingleHashes(arr.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchCodegen.shingleHashes($a, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHash64 = copy(child = c)
  override def prettyName: String = "shingle_hash64"
}

/** jaccard_long(a: array<long>, b: array<long>) → double (exact set Jaccard) */
case class JaccardLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchCodegen.jaccardLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchCodegen.jaccardLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardLong =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_long"
}

/** simhash_table_keys(sim: long, blocks, maxHamming) → array<long>: the
 * C(blocks, blocks−maxHamming) Manku block-combination bucket keys, as a
 * single array-producing expression (posexplode-ready). */
case class SimhashTableKeys(child: Expression, blocks: Int, maxHamming: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(sim: Any): Any =
    SketchCodegen.simhashTableKeys(sim.asInstanceOf[Long], blocks, maxHamming)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.SketchCodegen.simhashTableKeys($s, $blocks, $maxHamming)")
  override protected def withNewChildInternal(c: Expression): SimhashTableKeys =
    copy(child = c)
  override def prettyName: String = "simhash_table_keys"
}

/** simhash_first_table(xor: long, blocks, maxHamming) → int: first table
 * index whose block combination is clean for the pair (see
 * SketchCodegen.simhashFirstTable — the distinct-free pair-dedup). */
case class SimhashFirstTable(child: Expression, blocks: Int, maxHamming: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(x: Any): Any =
    SketchCodegen.simhashFirstTable(x.asInstanceOf[Long], blocks, maxHamming)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.SketchCodegen.simhashFirstTable($x, $blocks, $maxHamming)")
  override protected def withNewChildInternal(c: Expression): SimhashFirstTable =
    copy(child = c)
  override def prettyName: String = "simhash_first_table"
}

/** hash64_array(tokens: array<string>) → array<long> (stable content hash) */
case class Hash64Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(arr: Any): Any =
    SketchCodegen.hashArray(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchCodegen.hashArray($a)")
  override protected def withNewChildInternal(c: Expression): Hash64Array = copy(child = c)
  override def prettyName: String = "hash64_array"
}

/**
 * sketch_contains(url) → boolean: probe a broadcast [[SeenSketch]] from
 * inside whole-stage codegen — the admission hot path's prefilter
 * (SURVEY §2.3 D1). A native expression, not a UDF: no row-at-a-time
 * encoder boundary, and the broadcast is materialized once per task via
 * the references array (same pattern as Spark's own
 * BloomFilterMightContain).
 */
case class SketchContains(child: Expression,
                          bc: org.apache.spark.broadcast.Broadcast[SeenSketch])
    extends UnaryExpression with Predicate {
  override protected def nullSafeEval(u: Any): Any =
    bc.value.mightContain(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("seenSketchBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // probes the UTF8String directly (hash-identical to the String form;
    // both hash the UTF-8 bytes) — no per-row decode on the 10^7-row path
    defineCodeGen(ctx, ev, u =>
      s"((graft.functions.SeenSketch)$bcRef.value()).mightContain($u)")
  }
  override protected def withNewChildInternal(c: Expression): SketchContains = copy(child = c)
  override def prettyName: String = "sketch_contains"
}

object sketch {
  def sketch_contains(url: Column,
                      bc: org.apache.spark.broadcast.Broadcast[SeenSketch]): Column =
    GraftShim.column(SketchContains(GraftShim.expression(url), bc))
  def minhash_sig(shingleHashes: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(shingleHashes), k))
  def minhash_band_hashes(shingleHashes: Column, bands: Int, rows: Int): Column =
    GraftShim.column(MinHashBandHashes(GraftShim.expression(shingleHashes), bands, rows))
  def simhash64(tokens: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens)))
  def simhash_table_keys(sim: Column, blocks: Int, maxHamming: Int): Column =
    GraftShim.column(SimhashTableKeys(GraftShim.expression(sim), blocks, maxHamming))
  def simhash_first_table(xor: Column, blocks: Int, maxHamming: Int): Column =
    GraftShim.column(SimhashFirstTable(GraftShim.expression(xor), blocks, maxHamming))
  def hash64_array(tokens: Column): Column =
    GraftShim.column(Hash64Array(GraftShim.expression(tokens)))
  def rolling_hash64(tokens: Column): Column =
    GraftShim.column(RollingHash64(GraftShim.expression(tokens)))
  def jaccard_long(a: Column, b: Column): Column =
    GraftShim.column(JaccardLong(GraftShim.expression(a), GraftShim.expression(b)))
  def shingle_hash64(tokens: Column, n: Int): Column =
    GraftShim.column(ShingleHash64(GraftShim.expression(tokens), n))
}
