package graft

import graft.functions.UrlKit
import org.scalatest.funsuite.AnyFunSuite

/** Golden urljoin/hygiene cases. Expected values produced by CPython's
 * urllib.parse.urljoin — the exact function the reference calls at
 * gcloud_crawler.py:307,524 — so the resolver is pinned to reference
 * semantics, not to our own reading of RFC 3986. */
class UrlKitSpec extends AnyFunSuite {

  val goldenUrljoin: Seq[((String, String), String)] = Seq(
    ("https://a.test/p/000123", "https://b.test/x") -> "https://b.test/x",
    ("https://a.test/p/000123", "//b.test/y") -> "https://b.test/y",
    ("https://a.test/p/000123", "/q/1") -> "https://a.test/q/1",
    ("https://a.test/p/000123", "q/1") -> "https://a.test/p/q/1",
    ("https://a.test/p/000123", "../q/1") -> "https://a.test/q/1",
    ("https://a.test/p/000123", "../../q/1") -> "https://a.test/q/1",
    ("https://a.test/p/000123", "./q/1") -> "https://a.test/p/q/1",
    ("https://a.test/p/000123", "?k=v") -> "https://a.test/p/000123?k=v",
    ("https://a.test/p/000123", "#frag") -> "https://a.test/p/000123#frag",
    ("https://a.test/p/000123", "") -> "https://a.test/p/000123",
    ("https://a.test/p/a/b/c", "../../z") -> "https://a.test/p/z",
    ("https://a.test", "/x") -> "https://a.test/x",
    ("https://a.test", "x") -> "https://a.test/x",
    ("https://a.test/p/?q=1", "y") -> "https://a.test/p/y",
    ("https://a.test/p/000123#old", "new") -> "https://a.test/p/new",
    ("https://a.test/p/000123", "HTTPS://C.test/Z") -> "https://C.test/Z",
    ("https://a.test/dir/", "sub/page") -> "https://a.test/dir/sub/page",
    ("https://a.test/dir/", "..") -> "https://a.test/",
    ("https://a.test/dir/", ".") -> "https://a.test/dir/",
    ("https://a.test/dir/page", "...") -> "https://a.test/dir/...",
    ("https://a.test/p/000123", "/q/1?a=2#b") -> "https://a.test/q/1?a=2#b",
    ("https://a.test:8080/p/x", "y") -> "https://a.test:8080/p/y")

  test("resolve matches CPython urljoin on the golden table") {
    goldenUrljoin.foreach { case ((base, href), want) =>
      assert(UrlKit.resolve(base, href) == want, s"urljoin($base, $href)")
    }
  }

  test("hygiene: junk prefixes dropped (gcloud_crawler.py:303-306)") {
    val base = "https://a.test/p/1"
    Seq("", "   ", "javascript:void(0)", "#top", "mailto:x@y.z", "tel:+1555").foreach { h =>
      assert(UrlKit.canonicalize(base, h) == null, s"href=$h")
    }
  }

  test("canonicalize: resolve + fragment strip + http(s)-only (gcloud_crawler.py:307-313)") {
    val base = "https://a.test/p/1"
    assert(UrlKit.canonicalize(base, "/q/2#sec") == "https://a.test/q/2")
    assert(UrlKit.canonicalize(base, "https://b.test/x#y") == "https://b.test/x")
    assert(UrlKit.canonicalize(base, "ftp://b.test/x") == null)
    assert(UrlKit.canonicalize(base, "//b.test/z") == "https://b.test/z")
  }

  test("host and policyHost (urlparse(url).netloc, gcloud_master.py:334)") {
    assert(UrlKit.host("https://A.Test:8080/p/1?q=2") == "A.Test:8080")
    assert(UrlKit.host("https://a.test") == "a.test")
    assert(UrlKit.policyHost("https://A.Test:8080/p/1") == "a.test")
    assert(UrlKit.host("not-a-url") == "")
  }

  test("fixProtocol prepends https:// only when scheme missing (gcloud_crawler.py:616-619)") {
    assert(UrlKit.fixProtocol("a.test/x") == "https://a.test/x")
    assert(UrlKit.fixProtocol("http://a.test/x") == "http://a.test/x")
    assert(UrlKit.fixProtocol("https://a.test/x") == "https://a.test/x")
  }
}
