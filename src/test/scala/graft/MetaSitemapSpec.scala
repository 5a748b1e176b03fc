package graft

import graft.kernels.{MetaKernel, SitemapKernel}
import org.scalatest.funsuite.AnyFunSuite

/** Head-metadata and sitemap kernel contracts on adversarial inputs the
  * generated corpus can't produce (the oracle gate covers the generated
  * shapes).
  */
class MetaSitemapSpec extends AnyFunSuite {

  private val url = "http://host1.example/dir0/page1.html"

  test("first title wins; whitespace collapses; later duplicates ignored") {
    val m = MetaKernel.extract(
      "<html><head><title>  A \n\t B  </title></head>" +
        "<body><title>later</title></body></html>", url)
    assert(m.title === "A B")
  }

  test("self-closing <title/> is not a title; RCDATA entities decode") {
    val m = MetaKernel.extract(
      "<head><title/><title>A &amp; B</title></head><body>body text</body>", url)
    assert(m.title === "A & B")
    // and a lone <title/> must not swallow the document
    assert(MetaKernel.extract("<head><title/></head><body>hello</body>", url).title === "")
  }

  test("self-closing <table/> leaks no depth; <td/> is an empty cell") {
    val cells = graft.kernels.TableKernel.extract(
      "<table/><table><tr><td/><td>real</td></tr></table>")
    assert(cells === Vector(
      graft.kernels.TableKernel.Cell(0, 0, 0, "", false),
      graft.kernels.TableKernel.Cell(0, 0, 1, "real", false)))
  }

  test("a sitemap entry missing its close tag cannot swallow the next entry") {
    val es = SitemapKernel.parse(
      "<urlset><url><loc>http://a/1</loc><url><loc>http://a/2</loc></url></urlset>")
    assert(es.map(_.loc) === Vector("http://a/1", "http://a/2"))
  }

  test("missing fields are empty strings, never nulls") {
    val m = MetaKernel.extract("<html><body>no head</body></html>", url)
    assert(m === MetaKernel.PageMeta("", "", "", ""))
  }

  test("unclosed title at EOF still yields its text") {
    val m = MetaKernel.extract("<head><title>dangling", url)
    assert(m.title === "dangling")
  }

  test("og:title via property=, description entity-decoded, first wins") {
    val html =
      """<head><meta property="og:title" content="OG &amp; co">""" +
        """<meta name="description" content="first">""" +
        """<meta name="description" content="second"></head>"""
    val m = MetaKernel.extract(html, url)
    assert(m.ogTitle === "OG & co")
    assert(m.description === "first")
  }

  test("canonical resolves relative hrefs against the page URL") {
    val m = MetaKernel.extract(
      """<head><link rel="canonical" href="../canon.html"></head>""", url)
    assert(m.canonical === "http://host1.example/canon.html")
    val abs = MetaKernel.extract(
      """<head><link rel="CANONICAL" href="http://other.example/x"></head>""", url)
    assert(abs.canonical === "http://other.example/x")
  }

  test("stylesheet links and name-less metas don't pollute fields") {
    val m = MetaKernel.extract(
      """<head><link rel="stylesheet" href="/s.css"><meta charset="utf-8"></head>""", url)
    assert(m.canonical === "" && m.description === "")
  }

  test("urlset parse: loc trimmed+decoded, lastmod optional, kind=url") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><loc> http://a.example/p?x=1&amp;y=2 </loc><lastmod>2024-01-05</lastmod></url>
        |<url><loc>http://a.example/q</loc></url>
        |</urlset>""".stripMargin
    val es = SitemapKernel.parse(xml)
    assert(es === Vector(
      SitemapKernel.Entry("http://a.example/p?x=1&y=2", "2024-01-05", "url"),
      SitemapKernel.Entry("http://a.example/q", "", "url")))
  }

  test("sitemapindex parse yields kind=sitemap; <urlset> never matches <url>") {
    val xml =
      """<sitemapindex><sitemap><loc>http://a.example/s1.xml</loc></sitemap>
        |<sitemap><loc>http://a.example/s2.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val es = SitemapKernel.parse(xml)
    assert(es.map(_.kind).distinct === Vector("sitemap"))
    assert(es.map(_.loc) === Vector("http://a.example/s1.xml", "http://a.example/s2.xml"))
  }

  test("sitemap entries without a loc are skipped; truncated file is safe") {
    assert(SitemapKernel.parse("<urlset><url><lastmod>2024</lastmod></url></urlset>").isEmpty)
    assert(SitemapKernel.parse("<urlset><url><loc>http://x/").isEmpty)
    assert(SitemapKernel.parse("").isEmpty)
  }

  test("table kernel: omitted </td>/</tr> close implicitly; EOF flushes") {
    val cells = graft.kernels.TableKernel.extract(
      "<table><tr><td>a<td>b<tr><td>c</table> tail <table><tr><td>dangling")
    assert(cells === Vector(
      graft.kernels.TableKernel.Cell(0, 0, 0, "a", false),
      graft.kernels.TableKernel.Cell(0, 0, 1, "b", false),
      graft.kernels.TableKernel.Cell(0, 1, 0, "c", false),
      graft.kernels.TableKernel.Cell(1, 0, 0, "dangling", false)))
  }

  test("table kernel: nested table cells are layout, not data") {
    val cells = graft.kernels.TableKernel.extract(
      "<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>")
    assert(cells.map(_.text) === Vector("outer"))
  }

  test("table kernel: th marks header; cells before any tr get row 0") {
    val cells = graft.kernels.TableKernel.extract(
      "<table><td>loose</td><tr><th> H </th></tr></table>")
    assert(cells === Vector(
      graft.kernels.TableKernel.Cell(0, 0, 0, "loose", false),
      graft.kernels.TableKernel.Cell(0, 1, 0, "H", true)))
  }

  test("robots Sitemap: lines are global, case-insensitive, comment-stripped") {
    val txt =
      """User-agent: bot
        |Disallow: /x
        |SITEMAP: http://a.example/s1.xml # trailing comment
        |User-agent: *
        |sitemap: http://a.example/s2.xml
        |Sitemap:
        |""".stripMargin
    assert(graft.kernels.RobotsKernel.sitemaps(txt) ===
      Vector("http://a.example/s1.xml", "http://a.example/s2.xml"))
    // and a mid-group sitemap line doesn't perturb rule parsing
    val rules = graft.kernels.RobotsKernel.parse(txt, "bot")
    assert(!graft.kernels.RobotsKernel.isAllowed(rules, "/x/y"))
  }

  test("crawl-delay follows group selection: named shadows *, first wins") {
    val txt =
      """User-agent: *
        |Crawl-delay: 9
        |Disallow: /a
        |
        |User-agent: graftbot
        |Disallow: /b
        |
        |User-agent: megagraftbot
        |Crawl-delay: 3
        |Disallow: /c
        |""".stripMargin
    import graft.kernels.RobotsKernel.crawlDelay
    // governing graftbot group declares no delay -> None, * is shadowed
    assert(crawlDelay(txt, "graftbot") === None)
    // longer named token wins and carries its delay
    assert(crawlDelay(txt, "megagraftbot/1.0") === Some(3))
    // unmatched agent falls back to the * group
    assert(crawlDelay(txt, "randombot") === Some(9))
    // malformed value ignored
    assert(crawlDelay("User-agent: *\nCrawl-delay: soon\nDisallow: /x", "z") === None)
  }

  test("numeric and bare-ampersand entities decode safely") {
    val xml = "<urlset><url><loc>http://x/&#47;a&#x2F;b&z</loc></url></urlset>"
    assert(SitemapKernel.parse(xml).head.loc === "http://x//a/b&z")
  }
}
