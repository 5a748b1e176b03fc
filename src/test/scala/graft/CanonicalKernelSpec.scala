package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.CanonicalKernel.canonicalUrl

/** Hand-written canonical-link edge cases beyond the generator's shapes:
  * token-list rels, case, ordering, unresolvable hrefs, body decoys.
  */
class CanonicalKernelSpec extends AnyFunSuite {

  private val page = "http://ex.example/dir/page.html"

  test("absolute, relative and protocol-relative hrefs resolve") {
    assert(canonicalUrl(
      """<head><link rel="canonical" href="http://c.example/x.html"></head>""",
      page) === "http://c.example/x.html")
    assert(canonicalUrl(
      """<head><link rel="canonical" href="other.html"></head>""",
      page) === "http://ex.example/dir/other.html")
    assert(canonicalUrl(
      """<head><link rel="canonical" href="//cdn.example/y"></head>""",
      page) === "http://cdn.example/y")
  }

  test("rel is a token list, matched case-insensitively; near-miss tokens don't") {
    assert(canonicalUrl(
      """<head><link rel="alternate CANONICAL" href="/c"></head>""",
      page) === "http://ex.example/c")
    assert(canonicalUrl(
      """<head><link rel="canonicalish" href="/no"></head>""",
      page) === page)
    assert(canonicalUrl(
      """<head><link rel="canonical-alt" href="/no"></head>""",
      page) === page)
  }

  test("first canonical wins; absent or unresolvable falls back to self") {
    assert(canonicalUrl(
      """<head><link rel="canonical" href="/first">
        |<link rel="canonical" href="/second"></head>""".stripMargin,
      page) === "http://ex.example/first")
    assert(canonicalUrl("<head><title>t</title></head>", page) === page)
    assert(canonicalUrl(
      """<head><link rel="canonical" href="mailto:x@y"></head>""",
      page) === page)
  }
}
