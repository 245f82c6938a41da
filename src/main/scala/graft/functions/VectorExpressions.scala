package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * Dense-vector primitives over `array<float>` embedding columns, as native
 * Catalyst expressions so the ANN hot loop stays inside whole-stage
 * codegen (a Scala UDF would box every element; `aggregate`/`zip_with`
 * HOFs interpret their lambda per element).
 */
object VectorCodegen {

  /** cosine(a, b) as double; 0.0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Nearest centroid by cosine over a packed `array<struct<cell:bigint,
   * cv:array<float>>>`: argmax cosine, ties to the lowest cell id (the
   * same total order as max_by(struct(cos, -cell))). Order-independent —
   * every (cos, cell) pair is compared under a total order, so the result
   * does not depend on the array's element order. Empty array → -1. */
  def nearestCell(v: ArrayData, cents: ArrayData): Long = {
    val n = cents.numElements()
    var best = Double.NegativeInfinity
    var bestCell = -1L
    var i = 0
    while (i < n) {
      val row = cents.getStruct(i, 2)
      val cell = row.getLong(0)
      val c = cosine(v, row.getArray(1))
      if (c > best || (c == best && java.lang.Long.compareUnsigned(cell, bestCell) < 0)) {
        best = c; bestCell = cell
      }
      i += 1
    }
    bestCell
  }

  /** Random-hyperplane LSH signature: bit j = sign(v · r_j) where the
   * plane components r_j[i] are deterministic uniforms in [-1, 1] derived
   * from mix64(j, i) — identical on every executor with no broadcast. */
  def rhpSig(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val r = mix64(mix64(0xA11CE + j.toLong) ^ i.toLong)
        val u = (r.toDouble / Long.MaxValue.toDouble) // [-1, 1]
        dot += v.getFloat(i) * u
        i += 1
      }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** vec_sum_f(v: array<float>) → array<double>: element-wise sum aggregate
 * with PARTIAL (map-side) aggregation — the Lloyd-round reducer. The
 * previous centroid refinement posexploded every vector into (cell, pos, x)
 * rows and paid two aggregation exchanges per round over dim×corpus rows;
 * this buffer ships one dim-width partial sum per (partition, cell)
 * (guide §2.3: aggregate before you shuffle). Arithmetic is identical to
 * avg's double accumulation up to fp addition order, which already varied
 * with partitioning. Rows shorter than the widest seen are summed over
 * their prefix (engine inputs are fixed-width). */
case class VecSumFloat(child: Expression,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends aggregate.TypedImperativeAggregate[Array[Double]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray
  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) { b(i) += a.getFloat(i); i += 1 }
      b
    }
  }
  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }
  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)
  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }
  override def withNewMutableAggBufferOffset(o: Int): VecSumFloat =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumFloat =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VecSumFloat =
    copy(child = c)
  override def prettyName: String = "vec_sum_f"
}

/** topk_by_cos(id: bigint, cos: double, k) → array<struct<vec_id,cos>>,
 * sorted by (cos DESC, id ASC) and truncated to k — a PARTIALLY
 * aggregating top-k (guide §2.3: aggregate before you shuffle). The
 * former per-query ranking was row_number() over a Window partitioned by
 * qid: EVERY scored corpus row shuffles into one partition per query —
 * at 100 TB each query funnels the whole corpus through a single reduce
 * task. This buffer keeps at most k (id, cos) pairs per (map task, qid),
 * so the exchange carries ≤ k·tasks rows per query, and the final merge
 * is O(k·tasks). Selection is under the SAME total order as the window's
 * (desc cos, asc id) with ties at the k boundary resolved identically,
 * so the emitted rank 1..k rows are exactly row_number() ≤ k's. */
case class TopKByCos(idExpr: Expression, cosExpr: Expression, k: Int,
                     override val mutableAggBufferOffset: Int = 0,
                     override val inputAggBufferOffset: Int = 0)
    extends aggregate.TypedImperativeAggregate[TopKBuf]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(k > 0 && k <= 65536, s"k out of range: $k")
  override def left: Expression = idExpr
  override def right: Expression = cosExpr
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)
  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val id = idExpr.eval(input)
    val c = cosExpr.eval(input)
    if (id != null && c != null)
      buf.insert(id.asInstanceOf[Long], c.asInstanceOf[Double])
    buf
  }
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = { b1.mergeIn(b2); b1 }
  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ids(i), buf.cs(i))
      i += 1
    }
    new GenericArrayData(rows)
  }
  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.cs(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    buf.n = n
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong; buf.cs(i) = bb.getDouble; i += 1 }
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): TopKByCos =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByCos =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByCos =
    copy(idExpr = l, cosExpr = r)
  override def prettyName: String = "topk_by_cos"
}

/** Bounded sorted buffer for [[TopKByCos]]: parallel arrays of at most k
 * (id, cos) pairs held in (cos DESC, id ASC) order; O(k) insertion-sort
 * insert — k is a handful, far below any crossover where a heap wins. */
final class TopKBuf(val k: Int) {
  val ids = new Array[Long](k)
  val cs = new Array[Double](k)
  var n = 0
  /** true when (c1, id1) ranks strictly before (c2, id2). */
  @inline private def before(c1: Double, id1: Long, c2: Double, id2: Long): Boolean =
    c1 > c2 || (c1 == c2 && id1 < id2)
  def insert(id: Long, c: Double): Unit = {
    if (n == k && !before(c, id, cs(n - 1), ids(n - 1))) return
    // find insertion point from the tail (new rows usually rank low)
    var i = math.min(n, k - 1)
    while (i > 0 && before(c, id, cs(i - 1), ids(i - 1))) {
      ids(i) = ids(i - 1); cs(i) = cs(i - 1)
      i -= 1
    }
    ids(i) = id; cs(i) = c
    if (n < k) n += 1
  }
  def mergeIn(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ids(i), o.cs(i)); i += 1 }
  }
}

/** cosine_sim(a: array<float>, b: array<float>) → double */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorCodegen.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorCodegen.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** nearest_cell(v: array<float>, cents: array<struct<cell,cv>>) → bigint —
 * IVF coarse-quantizer assignment as ONE codegen'd scalar: the centroid
 * table (≤ nCells rows at any corpus scale) is packed into a broadcast
 * array so assignment is map-only — no per-vector aggregation shuffle. */
case class NearestCell(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any, cs: Any): Any =
    VectorCodegen.nearestCell(v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cs) => s"graft.functions.VectorCodegen.nearestCell($v, $cs)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCell =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_cell"
}

/** rhp_sig(v: array<float>, bits) → long — random-hyperplane LSH bucket key */
case class RhpSig(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VectorCodegen.rhpSig(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorCodegen.rhpSig($v, $bits)")
  override protected def withNewChildInternal(c: Expression): RhpSig = copy(child = c)
  override def prettyName: String = "rhp_sig"
}

object vec {
  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))
  def vec_sum_f(v: Column): Column =
    GraftShim.column(VecSumFloat(GraftShim.expression(v))
      .toAggregateExpression(isDistinct = false))
  def topk_by_cos(id: Column, cos: Column, k: Int): Column =
    GraftShim.column(TopKByCos(GraftShim.expression(id), GraftShim.expression(cos), k)
      .toAggregateExpression(isDistinct = false))
  def rhp_sig(v: Column, bits: Int): Column =
    GraftShim.column(RhpSig(GraftShim.expression(v), bits))
  def nearest_cell(v: Column, cents: Column): Column =
    GraftShim.column(NearestCell(GraftShim.expression(v), GraftShim.expression(cents)))
}
