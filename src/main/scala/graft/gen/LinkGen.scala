package graft.gen

/** Deterministic link-bearing pages for the outlink/robots oracle
  * queries. Every structural property is a closed-form function of
  * doc_id, so the DuckDB oracle reconstructs expected counts from
  * arithmetic alone — it never parses HTML:
  *
  *   - page URL: http://host{d%20}.example/dir{d%3}/page{d}.html
  *   - n = 3 + d%5 document links, j in [0, n):
  *       external (absolute, distinct host prefix `h`) iff (d+j)%3==0,
  *       else internal — root-relative for even j, path-relative for
  *       odd j (both must resolve back to the page host);
  *       rel=nofollow iff (d+j)%4==0
  *   - three always-dropped noise anchors (#fragment, mailto:,
  *     javascript:) on every page
  *   - meta robots: noindex iff d%7==0, nofollow iff d%5==0
  */
object LinkGen {

  def pageUrl(d: Long): String =
    s"http://host${d % 20}.example/dir${d % 3}/page$d.html"

  def nLinks(d: Long): Int = (3 + d % 5).toInt

  def pageHtml(d: Long): String = {
    val sb = new StringBuilder(512)
    sb ++= "<html><head><title>links</title>"
    val robots =
      (if (d % 7 == 0) List("noindex") else Nil) :::
        (if (d % 5 == 0) List("nofollow") else Nil)
    if (robots.nonEmpty)
      sb ++= s"""<meta name="robots" content="${robots.mkString(", ")}">"""
    sb ++= "</head><body><p>intro paragraph for page "
    sb ++= d.toString
    sb ++= "</p><ul>"
    var j = 0
    val n = nLinks(d)
    while (j < n) {
      val rel = if ((d + j) % 4 == 0) " rel=\"nofollow\"" else ""
      val href =
        if ((d + j) % 3 == 0) s"http://h${(d * 7 + j) % 20}.example/p$j.html"
        else if (j % 2 == 0) s"/s$j.html"
        else s"sub/s$j.html"
      sb ++= s"""<li><a href="$href"$rel>link $j</a></li>"""
      j += 1
    }
    sb ++= """<a href="#top">top</a><a href="mailto:x@example.com">mail</a>"""
    sb ++= """<a href="javascript:void(0)">js</a>"""
    sb ++= "</ul></body></html>"
    sb.toString
  }
}
