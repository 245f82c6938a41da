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

  /** Parse one attribute value by name from a tag's attribute region. */
  private def attrValue(attrs: String, name: String): String = {
    var i = 0
    val n = attrs.length
    while (i < n) {
      // find name boundary
      val j = attrs.indexOf(name, i)
      if (j < 0) return null
      val before = if (j == 0) ' ' else attrs.charAt(j - 1)
      var k = j + name.length
      // require word boundary before and '=' (with optional ws) after
      if ((before == ' ' || before == '\t' || before == '\n' || before == '"' || before == '\'') || j == 0) {
        while (k < n && (attrs.charAt(k) == ' ' || attrs.charAt(k) == '\t')) k += 1
        if (k < n && attrs.charAt(k) == '=') {
          k += 1
          while (k < n && (attrs.charAt(k) == ' ' || attrs.charAt(k) == '\t')) k += 1
          if (k < n && (attrs.charAt(k) == '"' || attrs.charAt(k) == '\'')) {
            val quote = attrs.charAt(k)
            val end = attrs.indexOf(quote, k + 1)
            return if (end < 0) attrs.substring(k + 1) else attrs.substring(k + 1, end)
          } else {
            var end = k
            while (end < n && attrs.charAt(end) != ' ' && attrs.charAt(end) != '\t') end += 1
            return attrs.substring(k, end)
          }
        }
      }
      i = j + name.length
    }
    null
  }

  /** Extract ordered spans from a raw document. Non-HTML content types are
   * the caller's concern (content-type gate F8); this always parses. */
  def extract(raw: String): Array[Span] = {
    if (raw == null) return Array.empty
    val out = ArrayBuffer.empty[Span]
    val n = raw.length
    var i = 0
    val textBuf = new java.lang.StringBuilder
    def flushText(): Unit = {
      val t = collapseWs(textBuf.toString)
      textBuf.setLength(0)
      if (t.nonEmpty) out += Span("text", t, "", out.length)
    }
    def readTag(start: Int): (String, String, Boolean, Int) = {
      // returns (lower tag name, attr region, isClosing, index after '>')
      var j = start + 1
      val closing = j < n && raw.charAt(j) == '/'
      if (closing) j += 1
      val nameStart = j
      while (j < n && { val c = raw.charAt(j); c.isLetterOrDigit || c == '-' || c == '_' }) j += 1
      val name = raw.substring(nameStart, j).toLowerCase
      // attr region runs to the matching '>' honoring quotes
      val attrStart = j
      var quote: Char = 0
      while (j < n && (quote != 0 || raw.charAt(j) != '>')) {
        val c = raw.charAt(j)
        if (quote == 0 && (c == '"' || c == '\'')) quote = c
        else if (quote != 0 && c == quote) quote = 0
        j += 1
      }
      val attrs = raw.substring(attrStart, math.min(j, n))
      (name, attrs, closing, math.min(j + 1, n))
    }
    def innerTextUntilClose(from: Int, tag: String): (String, Int) = {
      // scan for </tag>, collecting character data, skipping nested tags
      var j = from
      val buf = new java.lang.StringBuilder
      while (j < n) {
        val c = raw.charAt(j)
        if (c == '<') {
          val (name, _, closing, after) = readTag(j)
          if (closing && name == tag) return (collapseWs(buf.toString), after)
          j = after
        } else { buf.append(c); j += 1 }
      }
      (collapseWs(buf.toString), n)
    }
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '<') {
        val (name, attrs, closing, after) = readTag(i)
        if (closing || name.isEmpty) { i = after }
        else name match {
          case "script" | "style" =>
            flushText()
            val (_, after2) = innerTextUntilClose(after, name)
            i = after2
          case "title" =>
            flushText()
            val (text, after2) = innerTextUntilClose(after, "title")
            out += Span("title", text, "", out.length)
            i = after2
          case "a" =>
            flushText()
            val href = attrValue(attrs, "href")
            val (text, after2) = innerTextUntilClose(after, "a")
            if (href != null) out += Span("link", text, href, out.length)
            else if (text.nonEmpty) out += Span("text", text, "", out.length)
            i = after2
          case m if MediaTags(m) =>
            flushText()
            val src = attrValue(attrs, "src")
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
