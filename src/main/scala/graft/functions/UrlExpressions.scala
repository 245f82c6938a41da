package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String facade for generated code. Top-level object ⇒ scalac emits
 * static forwarders on class `graft.functions.UrlCodegen`, which Janino can
 * call from whole-stage-generated Java. */
object UrlCodegen {
  def canonicalize(base: UTF8String, href: UTF8String): UTF8String = {
    val r = UrlKit.canonicalize(base.toString, href.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def resolve(base: UTF8String, href: UTF8String): UTF8String =
    UTF8String.fromString(UrlKit.resolve(base.toString, href.toString))
  def host(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlKit.host(url.toString))
  def policyHost(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlKit.policyHost(url.toString))
  def fixProtocol(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlKit.fixProtocol(url.toString))
}

/** canonicalize(page_url, href): hygiene-filter + resolve + fragment-strip;
 * null ⇒ link dropped (SURVEY.md §2.9 U2; gcloud_crawler.py:297-314). */
case class UrlCanonicalize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(base: Any, href: Any): Any =
    UrlCodegen.canonicalize(base.asInstanceOf[UTF8String], href.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => s"""
      ${ev.value} = graft.functions.UrlCodegen.canonicalize($b, $h);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlCanonicalize =
    copy(left = l, right = r)
  override def prettyName: String = "url_canonicalize"
}

/** urljoin(base, href) without the hygiene filtering (gcloud_crawler.py:307). */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(base: Any, href: Any): Any =
    UrlCodegen.resolve(base.asInstanceOf[UTF8String], href.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.functions.UrlCodegen.resolve($b, $h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlResolve =
    copy(left = l, right = r)
  override def prettyName: String = "url_resolve"
}

/** urlparse(url).netloc (gcloud_master.py:334). */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(url: Any): Any =
    UrlCodegen.host(url.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.functions.UrlCodegen.host($u)")
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(child = c)
  override def prettyName: String = "url_host"
}

/** Lowercased, port-stripped host for policy matching (gcloud_master.py:54-59). */
case class UrlPolicyHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(url: Any): Any =
    UrlCodegen.policyHost(url.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.functions.UrlCodegen.policyHost($u)")
  override protected def withNewChildInternal(c: Expression): UrlPolicyHost = copy(child = c)
  override def prettyName: String = "url_policy_host"
}

/** Column-facade for graft's custom expressions + small composed helpers. */
object gf {
  import org.apache.spark.sql.functions._

  def url_canonicalize(base: Column, href: Column): Column =
    GraftShim.column(UrlCanonicalize(GraftShim.expression(base), GraftShim.expression(href)))
  def url_resolve(base: Column, href: Column): Column =
    GraftShim.column(UrlResolve(GraftShim.expression(base), GraftShim.expression(href)))
  def url_host(url: Column): Column = GraftShim.column(UrlHost(GraftShim.expression(url)))
  def url_policy_host(url: Column): Column =
    GraftShim.column(UrlPolicyHost(GraftShim.expression(url)))

  /** tokenize (C1): re.findall(r'\w+', text.lower()) — gcloud_indexer.py:37-41.
   * One native codegen'd scan (see [[graft.functions.Tokenize]]); equal to
   * the composed `filter(split(lower(text), "[^a-z0-9_]+"), _ =!= "")`. */
  def tokenize(text: Column): Column =
    GraftShim.column(Tokenize(GraftShim.expression(text), -1))

  /** First `n` tokens of [[tokenize]] without scanning past them —
   * byte-equal to `slice(tokenize(text), 1, n)`. */
  def tokenize_prefix(text: Column, n: Int): Column =
    GraftShim.column(Tokenize(GraftShim.expression(text), n))

  def extract_spans(raw: Column): Column =
    GraftShim.column(SpanExtract(GraftShim.expression(raw)))

  /** Log-line timestamp substring (LogParse's two reference regexes as one
   * byte scan); null when neither pattern matches. */
  def log_ts(line: Column): Column =
    GraftShim.column(LogTs(GraftShim.expression(line)))
}
