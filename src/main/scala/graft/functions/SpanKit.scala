package graft.functions

import graft.Span
import scala.collection.mutable.ArrayBuffer

/**
 * Parser from a raw interleaved HTML-ish document to its ordered span list
 * (SURVEY.md §2.9 U1). Reproduces what the reference extracts with
 * BeautifulSoup in document order — ordered anchors
 * (gcloud_crawler.py:296-314), body text (:317), title (:320) — over the
 * corpus format rendered by graft.sources.CorpusGen:
 *
 *   - <title>…</title>                 → Span("title", text, "", k)
 *   - <a …href="…"…>inner</a>          → Span("link", inner-text, href, k)
 *   - <img|video|audio|source …src=…>  → Span("media", "", src, k)
 *   - character data between tags      → Span("text", collapsed, "", k)
 *   - <script>/<style> content skipped (gcloud_crawler.py:536-543 strips them)
 *   - all other tags are transparent (do not emit, do not swallow text)
 *
 * Whitespace is trimmed and internal runs collapsed to a single space,
 * matching get_text(separator=' ', strip=True). Offsets are the 0-based
 * document-order position — the per-row invariant is (kind, text,
 * media_ref, offset) equality against the golden spans.
 */
object SpanKit extends Serializable {

  private val MediaTags = Set("img", "video", "audio", "source", "embed")

  def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
      else {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        pendingSpace = false
        started = true
      }
      i += 1
    }
    sb.toString
  }

  /** Parse one attribute value by name from a tag's attribute region
   * (given as [from, to) bounds into the raw document — r6: region-based,
   * so non-anchor/media tags never pay an attrs substring). Byte-for-byte
   * the same semantics as the previous substring form: all indexOf/charAt
   * arithmetic is offset by `from`. */
  private def attrValue(raw: String, from: Int, to: Int, name: String): String = {
    var i = from
    while (i < to) {
      // find name boundary
      val j = raw.indexOf(name, i)
      // a hit straddling the region end could not match in the old
      // substring form — reject it the same way
      if (j < 0 || j + name.length > to) return null
      val before = if (j == from) ' ' else raw.charAt(j - 1)
      var k = j + name.length
      // require word boundary before and '=' (with optional ws) after
      if ((before == ' ' || before == '\t' || before == '\n' || before == '"' || before == '\'') || j == from) {
        while (k < to && (raw.charAt(k) == ' ' || raw.charAt(k) == '\t')) k += 1
        if (k < to && raw.charAt(k) == '=') {
          k += 1
          while (k < to && (raw.charAt(k) == ' ' || raw.charAt(k) == '\t')) k += 1
          if (k < to && (raw.charAt(k) == '"' || raw.charAt(k) == '\'')) {
            val quote = raw.charAt(k)
            val end = raw.indexOf(quote, k + 1)
            return if (end < 0 || end >= to) raw.substring(k + 1, to)
              else raw.substring(k + 1, end)
          } else {
            var end = k
            while (end < to && raw.charAt(end) != ' ' && raw.charAt(end) != '\t') end += 1
            return raw.substring(k, end)
          }
        }
      }
      i = j + name.length
    }
    null
  }

  // r6 allocation discipline: tag classification codes so the per-tag scan
  // allocates NOTHING (the old readTag built a (lowered-name substring,
  // attrs substring, …) tuple for EVERY tag — ~30 short-lived objects per
  // document on the extract/crawl hot path). Names are classified in place
  // with case-insensitive region compares; attrs stay as [start, end)
  // bounds and are only materialized for <a>/<media> lookups.
  private final val TagOther = 0
  private final val TagEmpty = 1
  private final val TagScript = 2
  private final val TagStyle = 3
  private final val TagTitle = 4
  private final val TagA = 5
  private final val TagMedia = 6

  private def tagCode(raw: String, from: Int, to: Int): Int = {
    val len = to - from
    @inline def is(name: String): Boolean =
      len == name.length && raw.regionMatches(true, from, name, 0, len)
    if (len == 0) TagEmpty
    else if (is("a")) TagA
    else if (is("script")) TagScript
    else if (is("style")) TagStyle
    else if (is("title")) TagTitle
    else if (is("img") || is("video") || is("audio") || is("source") ||
             is("embed")) TagMedia
    else TagOther
  }

  /** Mutable per-extract() tag cursor — readTag parses into this instead of
   * allocating a tuple per tag. */
  private final class Tag {
    var code: Int = 0
    var closing: Boolean = false
    var attrStart: Int = 0
    var attrEnd: Int = 0
    var after: Int = 0
  }

  /** Extract ordered spans from a raw document. Non-HTML content types are
   * the caller's concern (content-type gate F8); this always parses. */
  def extract(raw: String): Array[Span] = {
    if (raw == null) return Array.empty
    val out = ArrayBuffer.empty[Span]
    val n = raw.length
    var i = 0
    val textBuf = new java.lang.StringBuilder
    val tag = new Tag
    def flushText(): Unit = {
      val t = collapseWs(textBuf.toString)
      textBuf.setLength(0)
      if (t.nonEmpty) out += Span("text", t, "", out.length)
    }
    def readTag(start: Int): Unit = {
      var j = start + 1
      tag.closing = j < n && raw.charAt(j) == '/'
      if (tag.closing) j += 1
      val nameStart = j
      while (j < n && { val c = raw.charAt(j); c.isLetterOrDigit || c == '-' || c == '_' }) j += 1
      tag.code = tagCode(raw, nameStart, j)
      // attr region runs to the matching '>' honoring quotes
      tag.attrStart = j
      var quote: Char = 0
      while (j < n && (quote != 0 || raw.charAt(j) != '>')) {
        val c = raw.charAt(j)
        if (quote == 0 && (c == '"' || c == '\'')) quote = c
        else if (quote != 0 && c == quote) quote = 0
        j += 1
      }
      tag.attrEnd = math.min(j, n)
      tag.after = math.min(j + 1, n)
    }
    def innerTextUntilClose(from: Int, closeCode: Int): (String, Int) = {
      // scan for the matching close tag, collecting character data,
      // skipping nested tags (closeCode is always a KNOWN code, so an
      // unknown/other closing tag can never match it)
      var j = from
      val buf = new java.lang.StringBuilder
      while (j < n) {
        val c = raw.charAt(j)
        if (c == '<') {
          readTag(j)
          if (tag.closing && tag.code == closeCode)
            return (collapseWs(buf.toString), tag.after)
          j = tag.after
        } else { buf.append(c); j += 1 }
      }
      (collapseWs(buf.toString), n)
    }
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '<') {
        readTag(i)
        val code = tag.code
        val after = tag.after
        if (tag.closing || code == TagEmpty) { i = after }
        else code match {
          case TagScript | TagStyle =>
            flushText()
            val (_, after2) = innerTextUntilClose(after, code)
            i = after2
          case TagTitle =>
            flushText()
            val (text, after2) = innerTextUntilClose(after, TagTitle)
            out += Span("title", text, "", out.length)
            i = after2
          case TagA =>
            flushText()
            val href = attrValue(raw, tag.attrStart, tag.attrEnd, "href")
            val (text, after2) = innerTextUntilClose(after, TagA)
            if (href != null) out += Span("link", text, href, out.length)
            else if (text.nonEmpty) out += Span("text", text, "", out.length)
            i = after2
          case TagMedia =>
            flushText()
            val src = attrValue(raw, tag.attrStart, tag.attrEnd, "src")
            if (src != null) out += Span("media", "", src, out.length)
            i = after
          case _ => // transparent tag: acts as a text-run boundary
            flushText()
            i = after
        }
      } else { textBuf.append(c); i += 1 }
    }
    flushText()
    out.toArray
  }
}
