package graft.kernels

import scala.collection.immutable.VectorBuilder

/** RSS 2.0 / Atom feed parser — the other frontier-discovery format a
  * crawler meets besides sitemaps (reference scope: the reference's
  * queue only sees uploads; feed polling is the crawl-side analog of
  * its polling source, SURVEY §2.1). Same deliberate design as
  * [[SitemapKernel]]: a bounded scanner over a rigid schema, not the
  * HTML tokenizer — plus the two feed-specific wrinkles: CDATA title
  * payloads (returned verbatim, no entity decoding inside CDATA, per
  * XML) and Atom's attribute-valued `<link href=.../>` (preferring
  * rel="alternate" when several links are present).
  */
object FeedKernel {

  /** kind = "rss" | "atom"; published "" when the item has no
    * pubDate/updated.
    */
  final case class Item(title: String, link: String, published: String, kind: String)

  def parse(xml: String): Vector[Item] = {
    val iAtom = xml.indexOf("<feed")
    val iRss = xml.indexOf("<rss")
    val isAtom = iAtom >= 0 && (iRss < 0 || iAtom < iRss)
    val itemTag = if (isAtom) "entry" else "item"
    val kind = if (isAtom) "atom" else "rss"
    val dateTag = if (isAtom) "updated" else "pubDate"
    val out = new VectorBuilder[Item]
    var i = SitemapKernel.openTag(xml, itemTag, 0)
    while (i >= 0) {
      // bound each item's span exactly as the sitemap scanner does: a
      // missing close tag must not swallow the next item
      val close = xml.indexOf(s"</$itemTag>", i)
      val nextOpen = SitemapKernel.openStart(xml, itemTag, i)
      val stop = math.min(
        if (close >= 0) close else xml.length,
        if (nextOpen >= 0) nextOpen else xml.length)
      val link =
        if (isAtom) atomLink(xml, i, stop)
        else tagTextCdata(xml, "link", i, stop)
      if (link.nonEmpty)
        out += Item(
          tagTextCdata(xml, "title", i, stop),
          link,
          tagTextCdata(xml, dateTag, i, stop),
          kind)
      i =
        if (close >= 0 && (nextOpen < 0 || close < nextOpen))
          SitemapKernel.openTag(xml, itemTag, close + itemTag.length + 3)
        else if (nextOpen >= 0) SitemapKernel.openTag(xml, itemTag, nextOpen)
        else -1
    }
    out.result()
  }

  /** Like SitemapKernel.tagText but CDATA-aware: `<![CDATA[...]]>`
    * content is returned verbatim (character data is already literal —
    * decoding entities inside it would corrupt it).
    */
  private def tagTextCdata(xml: String, name: String, from: Int, stop: Int): String = {
    val open = SitemapKernel.openTag(xml, name, from)
    if (open < 0 || open >= stop) return ""
    val close = xml.indexOf(s"</$name>", open)
    if (close < 0 || close > stop) return ""
    val raw = xml.substring(open, close).trim
    if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
      raw.substring(9, raw.length - 3)
    else SitemapKernel.decodeEntities(raw)
  }

  /** First `<link ... href=...>` in [from, stop), preferring one with
    * rel="alternate" (Atom feeds routinely carry rel="self" too).
    */
  private def atomLink(xml: String, from: Int, stop: Int): String = {
    var first = ""
    var i = from
    while (i >= 0 && i < stop) {
      i = SitemapKernel.openStart(xml, "link", i)
      if (i < 0 || i >= stop) return first
      val gt = xml.indexOf('>', i)
      val end = if (gt < 0 || gt > stop) stop else gt
      val tag = xml.substring(i, end)
      val href = attr(tag, "href")
      if (href.nonEmpty) {
        if (attr(tag, "rel") == "alternate") return href
        if (first.isEmpty) first = href
      }
      i = end + 1
    }
    first
  }

  /** Value of `name="..."` / `name='...'` inside an open-tag string. */
  private def attr(tag: String, name: String): String = {
    var i = tag.indexOf(name + "=")
    while (i > 0) {
      // require a delimiter before the name so e.g. hreflang= can't
      // match an href= lookup
      val before = tag.charAt(i - 1)
      if (Character.isWhitespace(before)) {
        val q = i + name.length + 1
        if (q < tag.length && (tag.charAt(q) == '"' || tag.charAt(q) == '\'')) {
          val endQ = tag.indexOf(tag.charAt(q), q + 1)
          if (endQ > q)
            return SitemapKernel.decodeEntities(tag.substring(q + 1, endQ))
        }
        return ""
      }
      i = tag.indexOf(name + "=", i + 1)
    }
    ""
  }
}
