package graft.gen

/** Deterministic article pages for the q_jsonld_article / q_pub_date /
  * q_pagination / q_soft404 oracles. Every harvested field is a
  * closed-form function of doc_id, so the DuckDB oracle reconstructs
  * expected values from arithmetic alone — it never parses HTML or JSON.
  *
  * Page (doc d, host h = d%20, mm = d%12+1, dd = d%28+1):
  *   - URL carries /Y/mm/dd/ with Y = 2021 + d%3 (the ladder's last rung)
  *   - meta article:published_time iff d%4==0 — VALID "2024-mm-dd..." only
  *     when d%8==0; d≡4 (mod 8) writes "not-a-date" (rung fall-through is
  *     load-bearing)
  *   - JSON-LD iff d%3==0: NewsArticle with headline `Story d "quoted"`
  *     (JSON escape load-bearing), datePublished 2023-mm-dd, author as an
  *     OBJECT (Person name "Reporter {d%50}") when d%6==0 else a plain
  *     STRING "Staff {d%10}"; wrapped in a root ARRAY behind a WebSite
  *     decoy when d%9==0. Decoy scripts (no type; application/json) and a
  *     broken ld+json (d%12==6) must all be ignored.
  *   - <time datetime="2022-mm-ddT08:30:00Z"> iff d%5==0
  *   - rel=next "/page/{d+1}" iff d%7 != 6; rel=prev "/page/{d-1}" iff d%7 >= 2
  *   - soft-404 iff d%11==7: title "Page not found", body marker sentence
  *     (otherwise title "Article {d}")
  *
  * Expected pub-date ladder:
  *   d%8==0 → 2024-mm-dd (meta) ; else d%3==0 → 2023-mm-dd (jsonld) ;
  *   else d%5==0 → 2022-mm-dd (time) ; else → (2021+d%3)-mm-dd (url)
  */
object ArticleGen {

  def pad2(v: Long): String = if (v < 10) s"0$v" else v.toString

  def mm(d: Long): String = pad2(d % 12 + 1)
  def dd(d: Long): String = pad2(d % 28 + 1)

  def pageUrl(d: Long): String =
    s"http://host${d % 20}.example/${2021 + d % 3}/${mm(d)}/${dd(d)}/a$d.html"

  def pageHtml(d: Long): String = {
    val h = d % 20
    val soft404 = d % 11 == 7
    val sb = new StringBuilder(1024)
    sb ++= "<html><head>"
    if (soft404) sb ++= "<title>Page not found</title>"
    else sb ++= s"<title>Article $d</title>"
    if (d % 4 == 0) {
      val v = if (d % 8 == 0) s"2024-${mm(d)}-${dd(d)}T00:00:00+00:00" else "not-a-date"
      sb ++= s"""<meta property="article:published_time" content="$v">"""
    }
    // decoys the harvest must skip: untyped script, application/json,
    // and (d%12==6) a broken ld+json body
    sb ++= """<script>var page = {"datePublished": "1999-01-01"};</script>"""
    sb ++= """<script type="application/json">{"datePublished":"1998-01-01"}</script>"""
    if (d % 12 == 6)
      sb ++= """<script type="application/ld+json">{"@type":"NewsArticle","datePublished": </script>"""
    if (d % 3 == 0) {
      val author =
        if (d % 6 == 0) s"""{"@type":"Person","name":"Reporter ${d % 50}"}"""
        else s""""Staff ${d % 10}""""
      val article =
        s"""{"@context":"https://schema.org","@type":"NewsArticle","headline":"Story $d \\"quoted\\"","datePublished":"2023-${mm(d)}-${dd(d)}T12:00:00Z","author":$author}"""
      val payload =
        if (d % 9 == 0) s"""[{"@type":"WebSite","name":"decoy"},$article]""" else article
      sb ++= s"""<script type="application/ld+json">$payload</script>"""
    }
    if (d % 7 != 6) sb ++= s"""<link rel="next" href="/page/${d + 1}">"""
    if (d % 7 >= 2) sb ++= s"""<link rel="prev" href="/page/${d - 1}">"""
    sb ++= "</head><body>"
    if (d % 5 == 0)
      sb ++= s"""<p>Updated <time datetime="2022-${mm(d)}-${dd(d)}T08:30:00Z">recently</time>.</p>"""
    if (soft404)
      sb ++= "<p>The page you requested does not exist.</p>"
    else
      sb ++= s"<p>Body of article $d on host$h with enough prose to look real.</p>"
    sb ++= "</body></html>"
    sb.toString
  }

  /** Compliance-signal page for q_license_meta. Closed-form in d:
    *   - rel=license: d%3==0 → CC BY 4.0 (protocol-relative, resolution
    *     load-bearing); d%3==1 → root-relative CC0 deed link pointing at
    *     creativecommons.org? No — a SITE-relative terms page (cc code
    *     must stay ""); d%9==2 → CC0 public-domain; else absent
    *   - robots meta: d%4==0 → "noindex, nofollow"; d%4==1 →
    *     "NOAI, noimageai" (case/sep variance load-bearing); d%4==2 →
    *     "index,follow"; d%4==3 → absent; decoy googlebot meta always
    *   - tdm-reservation: d%5==0 → "1"; d%5==1 → "0"; else absent
    */
  def complianceHtml(d: Long): String = {
    val sb = new StringBuilder(512)
    sb ++= "<html><head><title>Doc " + d + "</title>"
    (d % 9, d % 3) match {
      case (2, _) =>
        sb ++= """<link rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/">"""
      case (_, 0) =>
        sb ++= """<link rel="license" href="//creativecommons.org/licenses/by/4.0/">"""
      case (_, 1) =>
        sb ++= """<link rel="license" href="/terms.html">"""
      case _ => ()
    }
    d % 4 match {
      case 0 => sb ++= """<meta name="robots" content="noindex, nofollow">"""
      case 1 => sb ++= """<meta name="robots" content="NOAI noimageai">"""
      case 2 => sb ++= """<meta name="robots" content="index,follow">"""
      case _ => ()
    }
    sb ++= """<meta name="googlebot" content="noindex">""" // UA-specific decoy
    if (d % 5 == 0) sb ++= """<meta name="tdm-reservation" content="1">"""
    else if (d % 5 == 1) sb ++= """<meta name="tdm-reservation" content="0">"""
    sb ++= s"</head><body><p>content $d</p></body></html>"
    sb.toString
  }

  /** i18n page for q_declared_lang / q_hreflang_alternates. Closed-form:
    * html lang by d%5 (en-US / de / FR / " es " / absent — subtag,
    * case, trim all load-bearing); og:locale iff d%3==0 from a 4-locale
    * wheel; d%4 hreflang alternates over [en, de, fr] plus x-default
    * iff d%6==0; an RSS rel=alternate decoy WITHOUT hreflang always
    * present (must be excluded).
    */
  def i18nHtml(d: Long): String = {
    val langAttr = (d % 5) match {
      case 0 => """ lang="en-US""""
      case 1 => """ lang="de""""
      case 2 => """ lang="FR""""
      case 3 => """ lang=" es """"
      case _ => ""
    }
    val sb = new StringBuilder(512)
    sb ++= s"<html$langAttr><head><title>i18n $d</title>"
    if (d % 3 == 0) {
      val loc = (d % 4) match {
        case 0 => "en_US"; case 1 => "de_DE"; case 2 => "fr_FR"; case _ => "es_ES"
      }
      sb ++= s"""<meta property="og:locale" content="$loc">"""
    }
    val langs = Array("en", "de", "fr")
    var i = 0
    while (i < (d % 4).toInt) {
      sb ++= s"""<link rel="alternate" hreflang="${langs(i)}" href="/l/${langs(i)}/p$d.html">"""
      i += 1
    }
    if (d % 6 == 0)
      sb ++= s"""<link rel="alternate" hreflang="x-default" href="/l/p$d.html">"""
    sb ++= """<link rel="alternate" type="application/rss+xml" href="/feed.xml">"""
    sb ++= s"</head><body><p>body $d</p></body></html>"
    sb.toString
  }

  /** Refresh page for q_meta_refresh. Closed-form: d%4==0 → refresh
    * with `URL=` (uppercase, quoted) target /next/d.html and delay
    * d%30; d%4==1 → lowercase unquoted with comma separator, absolute
    * target on another host; d%4==2 → reload-only refresh (no url — not
    * a redirect); d%4==3 → none. A pragma decoy meta always present.
    */
  def refreshHtml(d: Long): String = {
    val sb = new StringBuilder(256)
    sb ++= "<html><head>"
    sb ++= """<meta http-equiv="pragma" content="no-cache">"""
    (d % 4) match {
      case 0 =>
        sb ++= s"""<meta http-equiv="Refresh" content="${d % 30}; URL='/next/$d.html'">"""
      case 1 =>
        sb ++= s"""<meta http-equiv="refresh" content="${d % 30},url=http://moved$d.example/p">"""
      case 2 =>
        sb ++= s"""<meta http-equiv="refresh" content="${d % 30}">"""
      case _ => ()
    }
    sb ++= s"</head><body><p>page $d</p></body></html>"
    sb.toString
  }

  /** Image-gallery page for q_image_alt_pairs. Closed-form: 1+d%4
    * images; image 0 is lazy-load (`data-src`, no `src`) iff d%5==0;
    * alt "" iff (d+i)%3==2 else entity-bearing "Photo d-i &amp;
    * caption"; srcset (1x/2x pair) iff (d+i)%2==0; a url-less decoy img
    * that must be skipped.
    */
  def galleryHtml(d: Long): String = {
    val n = 1 + (d % 4).toInt
    val sb = new StringBuilder(512)
    sb ++= s"<html><body><h1>Gallery $d</h1>"
    sb ++= """<img alt="decorative decoy without any url">"""
    var i = 0
    while (i < n) {
      val alt =
        if (d % 5 == 0 && i == 0) s"Lazy $d"
        else if ((d + i) % 3 == 2) ""
        else s"Photo $d-$i &amp; caption"
      val srcAttr =
        if (d % 5 == 0 && i == 0) s"""data-src="/img/${d}_$i.jpg""""
        else s"""src="/img/${d}_$i.jpg""""
      val srcset =
        if ((d + i) % 2 == 0)
          s""" srcset="/img/${d}_$i@1x.jpg 1x, /img/${d}_$i@2x.jpg 2x""""
        else ""
      sb ++= s"""<img $srcAttr alt="$alt"$srcset>"""
      i += 1
    }
    sb ++= "</body></html>"
    sb.toString
  }

  /** Structured page for the q_html_markdown oracle — every markdown
    * construct closed-form in d: h1/h2, bold + resolved link in a
    * paragraph, ul with 2+d%3 items, ol, fenced pre/code, blockquote
    * with an entity, hr, italic footer. Head noise (title/script) must
    * be dropped; whitespace padding must collapse.
    */
  def mdHtml(d: Long): String = {
    val n = 2 + (d % 3).toInt
    val sb = new StringBuilder(768)
    sb ++= "<html><head><title>ignore me</title><script>var x = 1;</script></head><body>"
    sb ++= s"<h1> Doc $d </h1>"
    sb ++= s"""<p>Intro paragraph for <b>doc $d</b> with a <a href="/next/$d">link $d</a>.</p>"""
    sb ++= s"<h2>Section ${d % 5}</h2>"
    sb ++= "<ul>"
    var i = 0
    while (i < n) { sb ++= s"<li> item $d-$i </li>"; i += 1 }
    sb ++= "</ul>"
    sb ++= s"<ol><li>first $d</li><li>second $d</li></ol>"
    sb ++= s"<pre><code>code line $d</code></pre>"
    sb ++= s"<blockquote><p>quote $d &amp; more</p></blockquote>"
    sb ++= "<hr>"
    sb ++= s"<p>Footer <i>note ${d % 7}</i></p>"
    sb ++= "</body></html>"
    sb.toString
  }

  /** Pages with `<link rel="canonical">` variants for the canonical-
    * cluster query: duplicate groups share the head a(d − d%7); hrefs
    * exercise absolute, relative (must resolve against the page dir),
    * protocol-relative, first-of-several-wins, and absent (self).
    */
  def canonicalHtml(d: Long): String = {
    val head = d - d % 7
    val sb = new StringBuilder(512)
    sb ++= s"<html><head><title>Canon $d</title>"
    // decoy: rel is a token LIST — "canonical-ish" tokens must not match
    sb ++= """<link rel="alternate canonicalish" href="/decoy.html">"""
    d % 5 match {
      case 0 => () // no canonical: page is its own canonical
      case 1 => sb ++= s"""<link rel="canonical" href="${pageUrl(head)}">"""
      case 2 => sb ++= s"""<link rel="canonical" href="a$head.html">"""
      case 3 =>
        sb ++= s"""<link rel="canonical" href="${pageUrl(head)}">"""
        // de-facto first-wins: a second canonical is ignored
        sb ++= s"""<link rel="canonical" href="${pageUrl(d)}">"""
      case _ =>
        sb ++= s"""<link rel="CANONICAL" href="//chost${head % 4}.example/c/a$head.html">"""
    }
    sb ++= s"</head><body><p>canon body $d</p></body></html>"
    sb.toString
  }
}
