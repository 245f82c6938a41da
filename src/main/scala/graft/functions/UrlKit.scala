package graft.functions

/**
 * Pure URL string logic matching the reference crawler's link handling
 * (semantics, not code, from /root/reference/src/gcloud_crawler.py):
 *
 *  - resolve(base, href): RFC-3986 reference resolution as used via
 *    Python's `urljoin` at gcloud_crawler.py:307,524 (scheme-relative,
 *    root-relative, relative with dot-segment normalization, query-only,
 *    fragment-only).
 *  - stripFragment: `url.split('#')[0]` (gcloud_crawler.py:310).
 *  - fixProtocol: prepend "https://" when no scheme (gcloud_crawler.py:616-619).
 *  - host: `urlparse(url).netloc` (keeps port/case; gcloud_master.py:334).
 *  - isJunkHref: the hygiene prefixes dropped before resolution
 *    (gcloud_crawler.py:303-306 — empty, javascript:, '#', mailto:, tel:).
 *
 * Kept as a plain object with String→String methods so the Catalyst
 * expressions in UrlExpressions.scala can call it from generated code
 * (whole-stage codegen emits a static call; no closure capture).
 */
object UrlKit extends Serializable {

  /** "^[A-Za-z][A-Za-z0-9+.-]*:" as a hand-rolled scan — this runs once
   * per extracted href on the admission hot path (10^7+/round), where the
   * previous anchored-Regex form allocated a Matcher + Option per call. */
  @inline def hasScheme(s: String): Boolean = {
    if (s.isEmpty) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return true
      if (!((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-')) return false
      i += 1
    }
    false
  }

  /** Domain-shape validation regex (F2, cli.py:18-21): dot-separated
   * labels of alphanumerics/hyphens (no leading/trailing hyphen, ≤ 63
   * chars each) ending in an alphabetic TLD of ≥ 2 chars. */
  val DomainRegex = "^([a-zA-Z0-9]([a-zA-Z0-9\\-]{0,61}[a-zA-Z0-9])?\\.)+[a-zA-Z]{2,}$"
  private val DomainPattern = java.util.regex.Pattern.compile(DomainRegex)

  def isValidDomain(s: String): Boolean =
    s != null && DomainPattern.matcher(s).matches()

  /** validate_url (cli.py:23-29): scheme and netloc both present. */
  def isValidUrl(url: String): Boolean =
    url != null && hasScheme(url) && host(url).nonEmpty

  def isHttp(url: String): Boolean = {
    val u = url
    u.startsWith("http://") || u.startsWith("https://")
  }

  def isJunkHref(href: String): Boolean = {
    if (href == null) return true
    val h = href.trim
    h.isEmpty || h.startsWith("javascript:") || h.startsWith("#") ||
      h.startsWith("mailto:") || h.startsWith("tel:")
  }

  /** url.split('#')[0] */
  def stripFragment(url: String): String = {
    val i = url.indexOf('#')
    if (i < 0) url else url.substring(0, i)
  }

  /** Prepend https:// when the scheme is missing (gcloud_crawler.py:616-619). */
  def fixProtocol(url: String): String =
    if (url.startsWith("http://") || url.startsWith("https://")) url
    else "https://" + url

  /** urlparse(url).netloc — chars after "scheme://" up to '/', '?' or '#'.
   * Returns "" when the URL has no authority component. */
  def host(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return ""
    val start = i + 3
    var end = url.length
    var j = start
    while (j < url.length && end == url.length) {
      val c = url.charAt(j)
      if (c == '/' || c == '?' || c == '#') end = j
      j += 1
    }
    url.substring(start, end)
  }

  /** Lowercased host without port — the form used for policy matching
   * (allowed_domains compare lowercases, gcloud_master.py:54-59). */
  def policyHost(url: String): String = {
    val h = host(url).toLowerCase
    val i = h.indexOf(':')
    if (i < 0) h else h.substring(0, i)
  }

  private def schemeOf(url: String): String = {
    val i = url.indexOf(':')
    if (i < 0) "" else url.substring(0, i)
  }

  /** Path+query split point: everything from the first '/' after authority. */
  private def splitAfterAuthority(url: String): (String, String) = {
    // returns (scheme://netloc, rest-starting-at-/-or-?-or-empty)
    val i = url.indexOf("://")
    if (i < 0) return (url, "")
    var j = i + 3
    while (j < url.length && url.charAt(j) != '/' && url.charAt(j) != '?' && url.charAt(j) != '#') j += 1
    (url.substring(0, j), url.substring(j))
  }

  /** True iff the path contains a "." or ".." SEGMENT (bounded by '/' or
   * the string ends). Without one, removeDotSegments is the identity —
   * every other segment (incl. interior empties and the trailing-slash
   * shape) passes through unchanged — so the common no-dots case skips the
   * split/ArrayBuffer/mkString entirely (admission hot path). */
  private def hasDotSegment(path: String): Boolean = {
    var i = path.indexOf('.')
    while (i >= 0) {
      if (i == 0 || path.charAt(i - 1) == '/') {
        val n = path.length
        if (i + 1 == n || path.charAt(i + 1) == '/') return true // "."
        if (path.charAt(i + 1) == '.' &&
            (i + 2 == n || path.charAt(i + 2) == '/')) return true // ".."
      }
      i = path.indexOf('.', i + 1)
    }
    false
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, as Python urljoin applies. */
  def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    // exhaustive check of the no-dot-segment identity: the ONLY dot-free
    // input the general algorithm rewrites is the bare "//" (its single
    // interior empty segment yields empty body + dropped suffix → "/"),
    // which resolve() can never produce but a direct caller could pass
    if (!hasDotSegment(path) && path != "//") return path
    val segs = path.split("/", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val leadingSlash = path.startsWith("/")
    var endDir = false
    while (i < segs.length) {
      val s = segs(i)
      s match {
        case "." => endDir = true
        case ".." =>
          endDir = true
          if (out.nonEmpty && out.last != "..") out.remove(out.length - 1)
          else if (!leadingSlash) out += ".."
        case "" =>
          // interior empty segments (//) are preserved by urljoin's split/join;
          // leading/trailing handled below
          if (i != 0 && i != segs.length - 1) out += ""
          endDir = i == segs.length - 1
        case seg =>
          out += seg
          endDir = false
      }
      i += 1
    }
    val body = out.mkString("/")
    val prefix = if (leadingSlash) "/" else ""
    val suffix = if (endDir && (out.nonEmpty || leadingSlash)) "/" else ""
    val joined = prefix + body + (if (body.nonEmpty || !leadingSlash) suffix else "")
    if (joined.isEmpty && leadingSlash) "/" else joined
  }

  /** urljoin(base, href) for absolute http(s) bases — the only bases the
   * crawl produces (seeds are validated absolute, cli.py:23-29). */
  def resolve(base: String, href0: String): String = {
    if (href0 == null) return base
    val href = href0.trim
    if (href.isEmpty) return stripFragment(base)
    if (hasScheme(href)) {
      // urlparse lowercases the scheme component; skip the substring +
      // concat allocations when it already is (the overwhelmingly common
      // case on the admission hot path)
      val ci = href.indexOf(':')
      var j = 0
      while (j < ci && !(href.charAt(j) >= 'A' && href.charAt(j) <= 'Z')) j += 1
      return if (j == ci) href
        else href.substring(0, ci).toLowerCase + href.substring(ci)
    }
    val baseNoFrag = stripFragment(base)
    val (root, rest) = splitAfterAuthority(baseNoFrag)
    if (href.startsWith("//")) return schemeOf(baseNoFrag) + ":" + href
    if (href.startsWith("/")) {
      val qi = href.indexOf('?')
      val (p, q) = if (qi < 0) (href, "") else (href.substring(0, qi), href.substring(qi))
      return root + removeDotSegments(p) + q
    }
    if (href.startsWith("?")) {
      val pi = rest.indexOf('?')
      val basePath = if (pi < 0) rest else rest.substring(0, pi)
      return root + basePath + href
    }
    if (href.startsWith("#")) return baseNoFrag + href
    // relative path: merge with base path directory, then normalize
    val qi = href.indexOf('?')
    val (hp, hq) = if (qi < 0) (href, "") else (href.substring(0, qi), href.substring(qi))
    val pi = rest.indexOf('?')
    val basePath = if (pi < 0) rest else rest.substring(0, pi)
    val dir = {
      val li = basePath.lastIndexOf('/')
      if (li < 0) "/" else basePath.substring(0, li + 1)
    }
    root + removeDotSegments(dir + hp) + hq
  }

  /** Full hygiene + canonicalization of one extracted href against its page
   * URL: returns null for dropped links (junk prefix or non-http result).
   * Mirrors the extract_links loop gcloud_crawler.py:297-314. */
  def canonicalize(base: String, href: String): String = {
    if (isJunkHref(href)) return null
    val abs = stripFragment(resolve(base, href))
    if (isHttp(abs) && host(abs).nonEmpty) abs else null
  }
}
