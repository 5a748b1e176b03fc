package graft.kernels

import scala.collection.immutable.VectorBuilder

/** Sitemap parser (sitemaps.org XML): `<urlset>` page entries and
  * `<sitemapindex>` child-sitemap entries — the crawl-frontier seed a
  * robots.txt `Sitemap:` line points at. Deliberately a dedicated
  * scanner rather than the HTML tokenizer: sitemap XML is a rigid
  * two-level schema and the scanner stays allocation-light; entity
  * decoding covers the five XML predefined entities plus numeric
  * references (URLs legally contain `&amp;`).
  */
object SitemapKernel {

  /** kind = "url" (urlset entry) or "sitemap" (index entry);
    * lastmod "" when absent.
    */
  final case class Entry(loc: String, lastmod: String, kind: String)

  def parse(xml: String): Vector[Entry] = {
    val iIdx = xml.indexOf("<sitemapindex")
    val iSet = xml.indexOf("<urlset")
    val isIndex = iIdx >= 0 && (iSet < 0 || iIdx < iSet)
    val item = if (isIndex) "sitemap" else "url"
    val out = new VectorBuilder[Entry]
    var i = openTag(xml, item, 0)
    while (i >= 0) {
      // an entry's span ends at its close tag OR the next entry's open,
      // whichever comes first — a missing </item> (tag soup) must not
      // widen the span into (and swallow) the following entry
      val close = xml.indexOf(s"</$item>", i)
      val nextOpen = openStart(xml, item, i)
      val stop = math.min(
        if (close >= 0) close else xml.length,
        if (nextOpen >= 0) nextOpen else xml.length)
      val loc = tagText(xml, "loc", i, stop)
      if (loc.nonEmpty)
        out += Entry(loc, tagText(xml, "lastmod", i, stop), item)
      i =
        if (close >= 0 && (nextOpen < 0 || close < nextOpen))
          openTag(xml, item, close + item.length + 3)
        else if (nextOpen >= 0) openTag(xml, item, nextOpen)
        else -1
    }
    out.result()
  }

  /** Index of the `<` of the next `<name>`/`<name ...>` at/after `from`,
    * -1 if absent. Matches whole element names only — `<url>` must not
    * match inside `<urlset>`.
    */
  private[kernels] def openStart(xml: String, name: String, from: Int): Int = {
    var i = from
    while (true) {
      i = xml.indexOf("<" + name, i)
      if (i < 0) return -1
      val after = i + name.length + 1
      if (after < xml.length && (xml.charAt(after) == '>' || Character.isWhitespace(xml.charAt(after))))
        return i
      i = after
    }
    -1
  }

  /** Index just past the `>` of the open tag found by [[openStart]]. */
  private[kernels] def openTag(xml: String, name: String, from: Int): Int = {
    val s = openStart(xml, name, from)
    if (s < 0) return -1
    val gt = xml.indexOf('>', s + name.length + 1)
    if (gt < 0) -1 else gt + 1
  }

  /** Decoded, trimmed text of the first `<name>...</name>` inside
    * [from, stop); "" when absent.
    */
  private[kernels] def tagText(xml: String, name: String, from: Int, stop: Int): String = {
    val open = openTag(xml, name, from)
    if (open < 0 || open >= stop) return ""
    val close = xml.indexOf(s"</$name>", open)
    if (close < 0 || close > stop) return ""
    decodeEntities(xml.substring(open, close).trim)
  }

  private[kernels] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i) s.substring(i + 1, semi) else ""
        val rep: String = ent match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
            try new String(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
            catch { case _: Exception => null }
          case _ if ent.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(ent.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (rep != null) { out.append(rep); i = semi + 1 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
