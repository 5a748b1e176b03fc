package graft.gen

/** Deterministic head-metadata pages and sitemaps for the q_html_meta /
  * q_sitemap_urls oracles. Like [[LinkGen]], every field is a closed-form
  * function of doc_id / host id so the DuckDB oracle reconstructs the
  * expected values from arithmetic alone — it never parses HTML or XML:
  *
  * Page head (doc d, host h = d%20):
  *   - title: "Page {d} & host{h}" — written with leading/trailing
  *     space, an internal newline, and &amp; (whitespace collapse AND
  *     RCDATA entity decoding are load-bearing)
  *   - meta description iff d%3!=0: "summary & notes for page {d}"
  *     (written with &amp; — attr entity decode is load-bearing)
  *   - og:title (property=, not name=) iff d%2==0: "OG Page {d}"
  *   - canonical link iff d%4!=0: root-relative "/canon/p{d}.html",
  *     so resolution against the page URL is load-bearing
  *   - noise: keywords meta, og:image, stylesheet link, a second title
  *     (first-wins), body anchors
  *
  * Sitemap (host h): index file iff h%5==0 with 2+h%3 child sitemaps;
  * else urlset with 5+h%5 urls — url i carries "?a=1&amp;b=2" iff
  * i%3==0 and lastmod "2024-01-{dd}" (dd = (h+i)%28+1) iff i%2==0.
  */
object MetaGen {

  def pageHtml(d: Long): String = {
    val h = d % 20
    val sb = new StringBuilder(512)
    sb ++= "<html><head>\n"
    sb ++= s"<title>  Page $d &amp;\n host$h  </title>"
    sb ++= "<meta charset=\"utf-8\">"
    if (d % 3 != 0)
      sb ++= s"""<meta name="description" content="summary &amp; notes for page $d">"""
    sb ++= s"""<meta name="keywords" content="noise, page$d">"""
    if (d % 2 == 0)
      sb ++= s"""<meta property="og:title" content="OG Page $d">"""
    sb ++= s"""<meta property="og:image" content="http://img.example/i$d.png">"""
    if (d % 4 != 0)
      sb ++= s"""<link rel="canonical" href="/canon/p$d.html">"""
    sb ++= """<link rel="stylesheet" href="/s.css">"""
    sb ++= "</head><body>"
    sb ++= s"<title>late duplicate $d</title>"
    sb ++= s"""<p>body of page $d</p><a href="/x$d.html">x</a>"""
    sb ++= "</body></html>"
    sb.toString
  }

  def sitemapXml(h: Long): String = {
    val sb = new StringBuilder(512)
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    if (h % 5 == 0) {
      sb ++= "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
      var i = 0L
      val n = 2 + h % 3
      while (i < n) {
        sb ++= s"<sitemap><loc> http://host$h.example/sitemap$i.xml </loc>"
        sb ++= s"<lastmod>2024-02-${pad2(i + 1)}</lastmod></sitemap>\n"
        i += 1
      }
      sb ++= "</sitemapindex>\n"
    } else {
      sb ++= "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
      var i = 0L
      val n = 5 + h % 5
      while (i < n) {
        val q = if (i % 3 == 0) "?a=1&amp;b=2" else ""
        sb ++= s"<url><loc>http://host$h.example/sm/p$i.html$q</loc>"
        if (i % 2 == 0) sb ++= s"<lastmod>2024-01-${pad2((h + i) % 28 + 1)}</lastmod>"
        sb ++= "</url>\n"
        i += 1
      }
      sb ++= "</urlset>\n"
    }
    sb.toString
  }

  /** Deterministic feed per host: RSS 2.0 for even hosts (title payload
    * cycles plain / entity-encoded / CDATA; pubDate only on even items),
    * Atom for odd hosts (attribute-valued link, rel="self" decoy first).
    * Every decoded expectation is arithmetic in (h, i) so the DuckDB
    * oracle can rebuild it.
    */
  def feedXml(h: Long): String = {
    val sb = new StringBuilder(512)
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    if (h % 2 == 0) {
      sb ++= "<rss version=\"2.0\"><channel>\n"
      sb ++= s"<title>Host $h channel</title><link>http://host$h.example/</link>\n"
      var i = 0L
      val n = 3 + h % 4
      while (i < n) {
        val title = i % 3 match {
          case 0 => s"Item $h-$i &amp; more"
          case 1 => s"<![CDATA[Raw <b>$h-$i</b>]]>"
          case _ => s"Plain $h-$i"
        }
        sb ++= s"<item><title>$title</title>"
        sb ++= s"<link>http://host$h.example/rss/$i</link>"
        if (i % 2 == 0)
          sb ++= s"<pubDate>Mon, ${pad2(i % 28 + 1)} Jan 2024 00:00:00 GMT</pubDate>"
        sb ++= "</item>\n"
        i += 1
      }
      sb ++= "</channel></rss>\n"
    } else {
      sb ++= "<feed xmlns=\"http://www.w3.org/2005/Atom\">\n"
      sb ++= s"<title>Host $h</title><link rel=\"self\" href=\"http://host$h.example/feed.xml\"/>\n"
      var i = 0L
      val n = 2 + h % 3
      while (i < n) {
        sb ++= s"<entry><title>Atom $h-$i</title>"
        // rel="self" decoy first — the parser must prefer the alternate
        sb ++= s"<link rel=\"self\" href=\"http://host$h.example/atom/$i.xml\"/>"
        sb ++= s"<link rel=\"alternate\" href=\"http://host$h.example/atom/$i\"/>"
        sb ++= s"<updated>2024-02-${pad2(i % 9 + 1)}T00:00:00Z</updated></entry>\n"
        i += 1
      }
      sb ++= "</feed>\n"
    }
    sb.toString
  }

  private def pad2(v: Long): String = if (v < 10) s"0$v" else v.toString

  /** Table-bearing page for q_html_table: one data table with a `<th>`
    * header row and 2+d%3 data rows x 2+d%2 cols; cell (1,0) carries an
    * entity (`x &amp; y{d}`), every cell is whitespace-padded (collapse
    * is load-bearing), and the last cell hosts a NESTED layout table the
    * kernel must skip. All closed-form in d for the arithmetic oracle.
    */
  def tableHtml(d: Long): String = {
    val cols = 2 + (d % 2).toInt
    val rows = 2 + (d % 3).toInt
    val sb = new StringBuilder(512)
    sb ++= s"<html><body><p>prose before table $d</p><table><tr>"
    var j = 0
    while (j < cols) { sb ++= s"<th> h$j </th>"; j += 1 }
    sb ++= "</tr>"
    var i = 1
    while (i <= rows) {
      sb ++= "<tr>"
      j = 0
      while (j < cols) {
        val v =
          if (i == 1 && j == 0) s"x &amp;\n y$d"
          else s"v${d}_${i}_$j"
        sb ++= s"<td>  $v  "
        if (i == rows && j == cols - 1)
          sb ++= "<table><tr><td>nested noise</td></tr></table>"
        sb ++= "</td>"
        j += 1
      }
      sb ++= "</tr>"
      i += 1
    }
    sb ++= s"</table><p>prose after $d</p></body></html>"
    sb.toString
  }
}
