package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen facade: raw document (UTF8String) → ArrayData of span structs. */
object SpanCodegen {
  def extract(raw: UTF8String): ArrayData = {
    val spans = SpanKit.extract(raw.toString)
    val rows = new Array[Any](spans.length)
    var i = 0
    while (i < spans.length) {
      val s = spans(i)
      rows(i) = InternalRow(
        UTF8String.fromString(s.kind),
        UTF8String.fromString(s.text),
        UTF8String.fromString(s.media_ref),
        s.offset)
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** extract_spans(raw) → array<struct<kind,text,media_ref,offset>> —
 * the U1 doc→spans extractor (SURVEY.md §2.9; BeautifulSoup walk at
 * gcloud_crawler.py:293-320). Used with posexplode for link expansion. */
case class SpanExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = SpanExtract.schema
  override protected def nullSafeEval(raw: Any): Any =
    SpanCodegen.extract(raw.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.functions.SpanCodegen.extract($r)")
  override protected def withNewChildInternal(c: Expression): SpanExtract = copy(child = c)
  override def prettyName: String = "extract_spans"
}

object SpanExtract {
  val elementType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))
  val schema: ArrayType = ArrayType(elementType, containsNull = false)
}
