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

object LogTsCodegen {
  @inline private def d(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def ws(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Leftmost match of `(\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}:\d{2})`, else
   * leftmost group of `\[([\d-]+\s+[\d:]+)\]`, else null — exactly
   * LogParse's two regexp_extract calls (all pattern atoms are ASCII, so
   * a byte scan matches at exactly the char positions the regex does; the
   * greedy runs are over disjoint classes, so no backtracking case
   * diverges). One pass each instead of two Java-regex executions per
   * line on the log-query path. */
  def extract(line: UTF8String): UTF8String = {
    val b = line.getBytes
    val n = b.length
    // main: d{4}-d{2}-d{2}\s+d{2}:d{2}:d{2}
    var i = 0
    while (i + 16 < n) { // minimal match is 19 bytes; cheap guard below
      if (d(b(i))) {
        val ok = i + 10 <= n && d(b(i + 1)) && d(b(i + 2)) && d(b(i + 3)) &&
          b(i + 4) == '-' && d(b(i + 5)) && d(b(i + 6)) && b(i + 7) == '-' &&
          d(b(i + 8)) && d(b(i + 9))
        if (ok) {
          var j = i + 10
          val wsStart = j
          while (j < n && ws(b(j))) j += 1
          if (j > wsStart && j + 8 <= n &&
              d(b(j)) && d(b(j + 1)) && b(j + 2) == ':' &&
              d(b(j + 3)) && d(b(j + 4)) && b(j + 5) == ':' &&
              d(b(j + 6)) && d(b(j + 7)))
            return UTF8String.fromBytes(b, i, j + 8 - i)
        }
      }
      i += 1
    }
    // alt: \[([\d-]+\s+[\d:]+)\]
    i = 0
    while (i < n) {
      if (b(i) == '[') {
        var j = i + 1
        val r1 = j
        while (j < n && (d(b(j)) || b(j) == '-')) j += 1
        if (j > r1) {
          val w0 = j
          while (j < n && ws(b(j))) j += 1
          if (j > w0) {
            val r2 = j
            while (j < n && (d(b(j)) || b(j) == ':')) j += 1
            if (j > r2 && j < n && b(j) == ']')
              return UTF8String.fromBytes(b, i + 1, j - i - 1)
          }
        }
      }
      i += 1
    }
    null
  }
}

/** log_ts(line) → string|null: the timestamp substring LogParse's two
 * reference regexes would extract (main anywhere, bracketed fallback). */
case class LogTs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    LogTsCodegen.extract(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.LogTsCodegen.extract($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): LogTs = copy(child = c)
  override def prettyName: String = "log_ts"
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
