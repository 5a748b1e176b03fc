package graft

import graft.kernels.LinkKernel
import org.scalatest.funsuite.AnyFunSuite

class LinkKernelSpec extends AnyFunSuite {

  private val base = "http://www.site.example/a/b/page.html"

  test("URL resolution: absolute, protocol-relative, root, relative, dot segments") {
    def r(h: String) = LinkKernel.resolve(base, h)
    assert(r("http://other.example/x") === Some("http://other.example/x"))
    assert(r("https://other.example/x?q=1") === Some("https://other.example/x?q=1"))
    assert(r("//cdn.example/lib.html") === Some("http://cdn.example/lib.html"))
    assert(r("/root.html") === Some("http://www.site.example/root.html"))
    assert(r("sib.html") === Some("http://www.site.example/a/b/sib.html"))
    assert(r("./sib.html") === Some("http://www.site.example/a/b/sib.html"))
    assert(r("../up.html") === Some("http://www.site.example/a/up.html"))
    assert(r("../../../over.html") === Some("http://www.site.example/over.html"))
    assert(r("x/../y.html") === Some("http://www.site.example/a/b/y.html"))
    assert(r("d/") === Some("http://www.site.example/a/b/d/"))
    assert(r("s.html?k=v&w=2") === Some("http://www.site.example/a/b/s.html?k=v&w=2"))
  }

  test("URL resolution drops non-document and fragment-only links") {
    def r(h: String) = LinkKernel.resolve(base, h)
    assert(r("#top") === None)
    assert(r("") === None)
    assert(r("  ") === None)
    assert(r("mailto:x@example.com") === None)
    assert(r("JavaScript:void(0)") === None)
    assert(r("tel:+1555") === None)
    assert(r("ftp://files.example/x") === None)
    // fragment stripped from a real link
    assert(r("s.html#sec") === Some("http://www.site.example/a/b/s.html"))
  }

  test("hostOf lowercases and strips port/userinfo") {
    assert(LinkKernel.hostOf("http://WWW.Site.Example:8080/x") === "www.site.example")
    assert(LinkKernel.hostOf("https://user:pw@h.example/x") === "h.example")
    assert(LinkKernel.hostOf("not-a-url") === "")
  }

  test("extract: hrefs entity-decoded, rel whole-token nofollow, base rebase") {
    val html =
      """<html><head><base href="/deep/dir/"></head><body>
        |<a href="x.html?a=1&amp;b=2">q</a>
        |<a href="/abs.html" rel="noopener nofollow">n</a>
        |<a href="y.html" rel="nofollower">not-nofollow</a>
        |</body></html>""".stripMargin
    val r = LinkKernel.extract(html, "http://h.example/orig/page.html")
    assert(r.links.map(_.url) === Vector(
      "http://h.example/deep/dir/x.html?a=1&b=2",
      "http://h.example/abs.html",
      "http://h.example/deep/dir/y.html"))
    assert(r.links.map(_.nofollow) === Vector(false, true, false))
    assert(r.links.forall(!_.external))
    assert(r.links.map(_.anchor) === Vector("q", "n", "not-nofollow"))
  }

  test("anchor text: whitespace collapse, nesting, markup inside, unclosed EOF") {
    val html =
      """<a href="/a">  two
        |   words </a>
        |<a href="/b">outer <a href="/c">inner</a>
        |<a href="/d"><b>bold</b> tail""".stripMargin
    val r = LinkKernel.extract(html, "http://h.example/")
    assert(r.links.map(l => (l.url, l.anchor)) === Vector(
      ("http://h.example/a", "two words"),
      ("http://h.example/b", "outer"), // nested open finalizes the outer
      ("http://h.example/c", "inner"),
      ("http://h.example/d", "bold tail"))) // EOF flush; inner markup contributes text
  }

  test("extract: robots meta gates, case/sep-insensitive, 'none' = both") {
    def gates(content: String) = {
      val r = LinkKernel.extract(
        s"""<meta name="ROBOTS" content="$content"><a href="http://x.example/">x</a>""",
        "http://h.example/")
      (r.indexable, r.followable)
    }
    assert(gates("noindex") === (false, true))
    assert(gates("NOFOLLOW") === (true, false))
    assert(gates("noindex, nofollow") === (false, false))
    assert(gates("none") === (false, false))
    assert(gates("index,follow") === (true, true))
    // no meta at all
    val r = LinkKernel.extract("<p>hi</p>", "http://h.example/")
    assert(r.indexable && r.followable)
  }

  test("extract: links inside script/comments are not seen; unclosed tags tolerated") {
    val html =
      """<script>var s = '<a href="http://evil.example/">x</a>';</script>
        |<!-- <a href="http://c.example/">c</a> -->
        |<a href="http://real.example/p">real""".stripMargin
    val r = LinkKernel.extract(html, "http://h.example/")
    assert(r.links.map(_.host) === Vector("real.example"))
    assert(r.links.head.external)
  }

  test("rendezvous shard assignment moves ONLY hosts owned by a removed shard") {
    // the scheme behind ops.LinkOps.fetchShards: shard = argmax over the
    // fleet of md5(host '#' shard). Shrinking the fleet 10 -> 9 must
    // move a host iff its argmax WAS the removed shard — HRW's minimal
    // movement property (mod-hashing would reshuffle ~90% of hosts)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"${b & 0xff}%02x").mkString
    var movedCount = 0
    (0L until 50L).foreach { h =>
      val hw = (0 until 10).map(s => md5hex(s"host$h.example#$s"))
      val shard10 = hw.indexOf(hw.max)
      val shard9 = hw.take(9).indexOf(hw.take(9).max)
      assert((shard10 != shard9) === (shard10 == 9), s"host $h")
      if (shard10 != shard9) movedCount += 1
    }
    // sanity: the removed shard owned ~1/10 of hosts, so SOME moved
    assert(movedCount > 0 && movedCount < 15)
  }

  test("generator closed forms match the kernel on a doc sweep") {
    (0L until 200L).foreach { d =>
      val r = LinkKernel.extract(graft.gen.LinkGen.pageHtml(d), graft.gen.LinkGen.pageUrl(d))
      val n = graft.gen.LinkGen.nLinks(d)
      assert(r.links.size === n, s"doc $d")
      val expExt = (0 until n).count(j => (d + j) % 3 == 0)
      assert(r.links.count(_.external) === expExt, s"doc $d external")
      assert(r.links.count(_.nofollow) === (0 until n).count(j => (d + j) % 4 == 0), s"doc $d nofollow")
      assert(r.indexable === (d % 7 != 0), s"doc $d indexable")
      assert(r.followable === (d % 5 != 0), s"doc $d followable")
    }
  }
}
