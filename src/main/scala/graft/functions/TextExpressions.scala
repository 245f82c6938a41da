package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, CollationSupport, GenericArrayData}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native tokenizer (C1: re.findall(r'\w+', text.lower()),
 * gcloud_indexer.py:37-41) as ONE codegen'd expression.
 *
 * Replaces the composed form `filter(split(lower(text), "[^a-z0-9_]+"), …)`
 * whose lambda HOF is interpreted (it both breaks whole-stage codegen for
 * the surrounding operators and re-runs a Java-regex split per evaluation —
 * the optimizer inlines the expression into explode-inferred filters and
 * projections, so the regex pipeline ran up to 3× per row per branch in the
 * postings/search plans).
 *
 * Exactness: lowercasing calls the SAME entry point Spark's `lower()`
 * compiles to (CollationSupport.Lower.exec with the child's collation id
 * and the session's ICU flag), and the token scan is byte-exact with the
 * regex: tokens are the maximal runs of [a-z0-9_] in the lowercased string.
 * Those are ASCII bytes, and in UTF-8 every non-ASCII character is built
 * from bytes ≥ 0x80 (never matching the class), so a byte scan splits at
 * exactly the positions the char-class regex splits at, and the empty
 * strings the regex split emits at the ends are exactly what the filter
 * dropped. TokenizeSpec pins equality against the composed form on
 * adversarial inputs (unicode case-folds like İ/K, empties, separators).
 */
object TextCodegen {

  /** Maximal [a-z0-9_] byte runs of lower(text); `limit` ≥ 0 stops after
   * that many tokens (prefix semantics — identical to slicing the full
   * array), -1 means all. */
  def tokenizeLower(s: UTF8String, collationId: Int, useICU: Boolean,
                    limit: Int): ArrayData = {
    val lowered = CollationSupport.Lower.exec(s, collationId, useICU)
    val bytes = lowered.getBytes
    val n = bytes.length
    if (limit == 0 || n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(n / 4 + 1, 64))
    var i = 0
    while (i < n) {
      // skip separators
      var b = bytes(i)
      while (i < n && !((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_')) {
        i += 1
        if (i < n) b = bytes(i)
      }
      if (i < n) {
        val start = i
        while (i < n && {
          val c = bytes(i)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
        }) i += 1
        out += UTF8String.fromBytes(bytes, start, i - start)
        if (limit > 0 && out.length >= limit) return new GenericArrayData(out.toArray)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** tokenize(text[, limit]) → array<string>: lowercased \w+ tokens, optionally
 * only the first `limit` (a pure prefix — equal to slice of the full form). */
case class Tokenize(child: Expression, limit: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  private lazy val collationId: Int =
    child.dataType.asInstanceOf[StringType].collationId
  private lazy val useICU: Boolean =
    SQLConf.get.getConf(SQLConf.ICU_CASE_MAPPINGS_ENABLED)
  override protected def nullSafeEval(s: Any): Any =
    TextCodegen.tokenizeLower(s.asInstanceOf[UTF8String], collationId, useICU, limit)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextCodegen.tokenizeLower($c, $collationId, $useICU, $limit)")
  override protected def withNewChildInternal(c: Expression): Tokenize = copy(child = c)
  override def prettyName: String = "tokenize"
}
