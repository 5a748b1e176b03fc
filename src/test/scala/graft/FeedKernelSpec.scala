package graft

import graft.kernels.FeedKernel
import org.scalatest.funsuite.AnyFunSuite

/** Feed-parser contracts beyond the generator's shapes: tag soup,
  * CDATA literalness, attribute decoys, link-less items.
  */
class FeedKernelSpec extends AnyFunSuite {

  test("RSS items parse with entity-decoded and CDATA titles") {
    val xml =
      """<rss version="2.0"><channel><title>chan</title>
        |<item><title>A &amp; B</title><link>http://x/1</link>
        |  <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
        |<item><title><![CDATA[keep &amp; <raw>]]></title><link>http://x/2</link></item>
        |</channel></rss>""".stripMargin
    val items = FeedKernel.parse(xml)
    assert(items.map(_.title) === Vector("A & B", "keep &amp; <raw>"))
    assert(items.map(_.link) === Vector("http://x/1", "http://x/2"))
    assert(items.map(_.published) === Vector("Mon, 01 Jan 2024 00:00:00 GMT", ""))
    assert(items.forall(_.kind == "rss"))
  }

  test("a missing </item> must not swallow the next item") {
    val xml =
      """<rss><channel>
        |<item><title>first</title><link>http://x/1</link>
        |<item><title>second</title><link>http://x/2</link></item>
        |</channel></rss>""".stripMargin
    assert(FeedKernel.parse(xml).map(_.link) === Vector("http://x/1", "http://x/2"))
  }

  test("Atom prefers rel=alternate over self and skips link-less entries") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>
        |<link rel="self" href="http://x/feed.xml"/>
        |<entry><title>e1</title>
        |  <link rel="self" href="http://x/self1"/>
        |  <link rel="alternate" href="http://x/alt1"/>
        |  <updated>2024-02-01T00:00:00Z</updated></entry>
        |<entry><title>no link</title><updated>2024-02-02T00:00:00Z</updated></entry>
        |<entry><title>e3</title><link href="http://x/bare3"/></entry>
        |</feed>""".stripMargin
    val items = FeedKernel.parse(xml)
    assert(items.map(_.link) === Vector("http://x/alt1", "http://x/bare3"))
    assert(items.map(_.title) === Vector("e1", "e3"))
    assert(items.map(_.published) === Vector("2024-02-01T00:00:00Z", ""))
    assert(items.forall(_.kind == "atom"))
  }

  test("hreflang does not satisfy an href lookup; entities in href decode") {
    val xml =
      """<feed><entry><title>t</title>
        |<link hreflang="en" href="http://x/a?b=1&amp;c=2"/></entry></feed>""".stripMargin
    assert(FeedKernel.parse(xml).map(_.link) === Vector("http://x/a?b=1&c=2"))
  }
}
