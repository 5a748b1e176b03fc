package graft

import graft.kernels.UrlTrapKernel
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-trap classifier contracts beyond the generated shapes. */
class UrlTrapSpec extends AnyFunSuite {

  private def v(u: String) = UrlTrapKernel.classify(u)

  test("repeated segment needs three occurrences; two is normal") {
    assert(!v("http://h.example/a/b/a/p").repeatedSeg)
    assert(v("http://h.example/a/b/a/c/a/p").repeatedSeg)
    assert(v("http://h.example/cal/2024/01/cal/2024/02/cal/x").repeatedSeg)
  }

  test("depth and query budgets sit exactly at their thresholds") {
    assert(!v("http://h.example/1/2/3/4/5/6/7/8").tooDeep)
    assert(v("http://h.example/1/2/3/4/5/6/7/8/9").tooDeep)
    assert(!v("http://h.example/p?a=1&b=2&c=3&d=4&e=5").manyParams)
    assert(v("http://h.example/p?a=1&b=2&c=3&d=4&e=5&f=6").manyParams)
  }

  test("session ids by name (any case) and by 32-hex value") {
    assert(v("http://h.example/p?JSESSIONID=abc").sessionParam)
    assert(v("http://h.example/p?t=0123456789abcdef0123456789abcdef").sessionParam)
    assert(!v("http://h.example/p?t=0123456789abcdef").sessionParam) // 16 hex: too short
    assert(!v("http://h.example/p?id=42").sessionParam)
  }

  test("property: trap classifier, SURT and srcset parsing are total") {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300),
      org.scalacheck.Prop.forAll { (s: String) =>
        UrlTrapKernel.classify(s)
        graft.kernels.SurtKernel.surtKey(s)
        graft.kernels.ImageKernel.parseSrcset(s)
        graft.kernels.RefreshKernel.extract(s, "http://h.example/p")
        true // totality is the contract
      })
    assert(res.passed, res.toString)
  }

  test("fragments are not query params; authority is not a path segment") {
    assert(!v("http://h.example/p#a=1&b=2&c=3&d=4&e=5&f=6").manyParams)
    // a '?' INSIDE the fragment is not a query string either
    assert(!v("http://h.example/p#frag?a=1&b=2&c=3&d=4&e=5&f=6").manyParams)
    assert(!v("http://h.example/p#frag?phpsessid=x").sessionParam)
    assert(!v("http://deep.sub.host.name.example/a/b").tooDeep)
    assert(!v("http://h.example").isTrap)
    assert(!v("").isTrap)
  }
}
