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

  /** robots.txt body for host h (= doc host number, 0..19). Structure:
    * a decoy group for another agent, a specific `graftbot` group
    * (Disallow /dir{h%3}/ with an Allow carve-out /dir{h%3}/ok/, plus a
    * wildcard `*.tmp$` disallow on every 4th host), and a `*` group
    * (Disallow /private/) that graftbot's named group SHADOWS — group
    * selection, longest-match precedence, and wildcard/$ matching are
    * all load-bearing for the closed-form verdicts in
    * [[graft.ops.LinkOps.robotsTxtGateSql]].
    */
  def robotsTxt(h: Long): String = {
    val sb = new StringBuilder(256)
    sb ++= "# synthetic robots for host "
    sb ++= h.toString
    // global (group-independent) sitemap pointers, before any group so
    // they can't perturb UA-collection state in group parsing
    sb ++= s"\nSitemap: http://host$h.example/sitemap0.xml\n"
    if (h % 2 == 0) sb ++= s"sitemap: http://host$h.example/sitemap1.xml # alt\n"
    sb ++= "User-agent: otherbot\nDisallow: /\n\n"
    sb ++= "User-agent: graftbot\n"
    sb ++= s"Disallow: /dir${h % 3}/\n"
    sb ++= s"Allow: /dir${h % 3}/ok/\n"
    if (h % 4 == 0) sb ++= "Disallow: /*.tmp$\n"
    sb ++= s"Crawl-delay: ${1 + h % 4}\n\n"
    sb ++= "User-agent: *\nDisallow: /private/\n"
    sb.toString
  }

  /** Candidate fetch path for doc d against host d%20's rules; the five
    * kinds exercise prefix block, allow carve-out, group shadowing,
    * wildcard-$, and plain allow.
    */
  def fetchPath(d: Long): String = (d % 5) match {
    case 0 => s"/dir${d % 3}/p$d.html" // blocked iff d%3 == (d%20)%3
    case 1 => s"/dir${(d % 20) % 3}/ok/p$d.html" // allow carve-out wins
    case 2 => s"/private/p$d.html" // '*' group shadowed by graftbot group
    case 3 => s"/t$d.tmp" // blocked iff (d%20)%4 == 0 (wildcard + $)
    case _ => s"/open/p$d.html" // no rule matches
  }

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
