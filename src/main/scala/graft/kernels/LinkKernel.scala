package graft.kernels

import scala.collection.mutable.ArrayBuffer

/** Outlink + robots extraction from raw HTML — the link-graph stage of a
  * crawl pipeline (the reference never built one: its inputs were OCR'd
  * medical forms; a webtext corpus builder needs per-page outlinks for
  * frontier scheduling, domain-graph stats, and link-based quality
  * signals).
  *
  * Runs the same [[HtmlTokenizer]] as text extraction in attrs mode, so
  * links see the identical lenient parse (raw-text skipping, entity
  * decoding, void tags). Per page it produces:
  *   - resolved outlinks: absolute http(s) URLs after RFC 3986-style
  *     resolution against the page URL (or a `<base href>` when
  *     present), fragment stripped; `mailto:`/`javascript:`/`data:`/
  *     `tel:` and fragment-only self references are dropped;
  *   - per-link nofollow (from `rel`);
  *   - page-level robots directives from `<meta name=robots>`.
  *
  * Pure Scala, zero Spark imports — unit-testable without a session,
  * runs inside `mapPartitions`.
  */
object LinkKernel {

  /** One resolved outlink. `host` is the lowercase authority without
    * port; `external` = host differs from the page's own host; `anchor`
    * is the whitespace-collapsed text between the link's open/close tags
    * ("" when the anchor wraps no text).
    */
  final case class Link(url: String, host: String, external: Boolean,
    nofollow: Boolean, anchor: String)

  /** Page-level result. `indexable`/`followable` are the meta-robots
    * gates (true unless a robots directive says otherwise).
    */
  final case class PageLinks(links: Vector[Link], indexable: Boolean, followable: Boolean)

  private val DropSchemes =
    Array("mailto:", "javascript:", "data:", "tel:", "ftp:", "about:")

  /** Lowercase host (authority minus port/userinfo) of an absolute URL;
    * "" when the URL has no `scheme://` part.
    */
  def hostOf(url: String): String = {
    val at = url.indexOf("://")
    if (at < 0) return ""
    var s = at + 3
    var e = s
    while (e < url.length && { val c = url.charAt(e); c != '/' && c != '?' && c != '#' }) e += 1
    var seg = url.substring(s, e)
    val ui = seg.indexOf('@')
    if (ui >= 0) seg = seg.substring(ui + 1)
    val pi = seg.indexOf(':')
    if (pi >= 0) seg = seg.substring(0, pi)
    seg.toLowerCase
  }

  /** Collapse `.` and `..` segments of a path (query preserved verbatim). */
  private def normalizePath(path: String): String = {
    val qi = path.indexOf('?')
    val (p, q) = if (qi >= 0) (path.substring(0, qi), path.substring(qi)) else (path, "")
    val out = new ArrayBuffer[String]()
    var i = 0
    val n = p.length
    while (i < n) {
      var j = p.indexOf('/', i)
      if (j < 0) j = n
      val seg = p.substring(i, j)
      seg match {
        case "." | "" => () // empty = duplicate slash; both collapse
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case s => out += s
      }
      i = j + 1
    }
    val trailingSlash = p.endsWith("/") || p.endsWith("/.") || p.endsWith("/..")
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "") + q
  }

  private def hasScheme(href: String): Int = {
    // scheme = ALPHA *(ALPHA / DIGIT / "+" / "-" / ".") ":"
    if (href.isEmpty) return -1
    val c0 = href.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return -1
    var i = 1
    while (i < href.length) {
      val c = href.charAt(i)
      if (c == ':') return i
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return -1
      i += 1
    }
    -1
  }

  /** Resolve `href` against `baseUrl`; None = not a followable http(s)
    * document link (other scheme, fragment-only, empty, or unresolvable
    * relative because the base itself is not absolute).
    */
  def resolve(baseUrl: String, href0: String): Option[String] = {
    var href = href0.trim
    if (href.isEmpty) return None
    val fi = href.indexOf('#')
    if (fi == 0) return None // fragment-only self reference
    if (fi > 0) href = href.substring(0, fi)
    val low = href.toLowerCase
    var k = 0
    while (k < DropSchemes.length) {
      if (low.startsWith(DropSchemes(k))) return None
      k += 1
    }
    val si = hasScheme(href)
    if (si > 0) {
      val scheme = low.substring(0, si)
      return if (scheme == "http" || scheme == "https") Some(href) else None
    }
    val bi = baseUrl.indexOf("://")
    if (bi < 0) return None
    val baseScheme = baseUrl.substring(0, bi)
    if (href.startsWith("//")) return Some(baseScheme + ":" + href)
    // authority root = scheme://host[:port]
    var pe = bi + 3
    while (pe < baseUrl.length && { val c = baseUrl.charAt(pe); c != '/' && c != '?' && c != '#' }) pe += 1
    val root = baseUrl.substring(0, pe)
    if (href.startsWith("/")) return Some(root + normalizePath(href))
    // relative: merge with the base path's directory
    var pathEnd = baseUrl.indexOf('?', pe)
    if (pathEnd < 0) pathEnd = baseUrl.length
    val basePath = if (pe == pathEnd) "/" else baseUrl.substring(pe, pathEnd)
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    Some(root + normalizePath(dir + href))
  }

  private final class LinkSink extends HtmlTokenizer.Sink {
    val raw = new ArrayBuffer[(String, String, String)]() // href, rel, anchor
    var baseHref: String = null
    var robots: String = null
    // anchor-text accumulation for the currently open <a>; a nested <a>
    // open (invalid HTML, common in the wild) finalizes the previous one
    private var curHref: String = null
    private var curRel: String = null
    private val curText = new java.lang.StringBuilder(64)
    private var collecting = false

    private def finish(): Unit = {
      if (curHref != null) {
        // collapse whitespace runs, trim — anchor text is a label, not prose
        val sb = new java.lang.StringBuilder(curText.length)
        var i = 0
        var pendingSpace = false
        while (i < curText.length) {
          val c = curText.charAt(i)
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = sb.length > 0
          else { if (pendingSpace) sb.append(' '); pendingSpace = false; sb.append(c) }
          i += 1
        }
        raw += ((curHref, curRel, sb.toString))
      }
      curHref = null; curRel = null; curText.setLength(0); collecting = false
    }

    override def open(name: String, classId: String, selfClosing: Boolean): Unit =
      if (name == "a") finish()
    override def close(name: String): Unit = if (name == "a") finish()
    override def text(s: CharSequence): Unit = if (collecting) curText.append(s)
    override def link(href: String, rel: String): Unit = {
      curHref = href; curRel = rel; collecting = true
    }
    override def meta(name: String, content: String): Unit =
      if (robots == null && name.equalsIgnoreCase("robots")) robots = content
    override def base(href: String): Unit = if (baseHref == null) baseHref = href
    def end(): Unit = finish() // EOF with an unclosed trailing anchor
  }

  private def relNofollow(rel: String): Boolean = {
    // rel is a space-separated token list; match whole tokens only
    var i = 0
    val n = rel.length
    while (i < n) {
      while (i < n && (rel.charAt(i) == ' ' || rel.charAt(i) == '\t')) i += 1
      var j = i
      while (j < n && rel.charAt(j) != ' ' && rel.charAt(j) != '\t') j += 1
      if (j - i == 8 && rel.regionMatches(true, i, "nofollow", 0, 8)) return true
      i = j
    }
    false
  }

  private def robotsHas(content: String, token: String): Boolean =
    content.split("[,\\s]+").exists(_.equalsIgnoreCase(token))

  /** Extract outlinks + robots gates from one page. */
  def extract(html: String, pageUrl: String): PageLinks = {
    val sink = new LinkSink
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    sink.end()
    // <base href> rebases resolution when it itself resolves
    val baseUrl =
      if (sink.baseHref == null) pageUrl
      else resolve(pageUrl, sink.baseHref).getOrElse(pageUrl)
    val pageHost = hostOf(pageUrl)
    val out = Vector.newBuilder[Link]
    var i = 0
    while (i < sink.raw.length) {
      val (href, rel, anchor) = sink.raw(i)
      resolve(baseUrl, href) match {
        case Some(u) =>
          val h = hostOf(u)
          out += Link(u, h, external = h != pageHost,
            nofollow = relNofollow(rel), anchor = anchor)
        case None => ()
      }
      i += 1
    }
    val (idx, fol) =
      if (sink.robots == null) (true, true)
      else (!robotsHas(sink.robots, "noindex") && !robotsHas(sink.robots, "none"),
        !robotsHas(sink.robots, "nofollow") && !robotsHas(sink.robots, "none"))
    PageLinks(out.result(), idx, fol)
  }

  /** Tracking parameters that never change the served document: the
    * utm_* campaign family plus the common click-id params. Stripping
    * them is the first URL-canonicalization step of crawl dedup —
    * visit-tracking variants of one page collapse to a single frontier
    * key before any content is fetched.
    */
  private val TrackingParams = Set(
    "fbclid", "gclid", "msclkid", "yclid", "igshid", "mc_eid",
    "_hsenc", "_hsmi", "mkt_tok", "ref_src", "twclid")

  private def isTracking(name: String): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || TrackingParams.contains(n)
  }

  /** Remove tracking query parameters, preserving the order of the
    * rest; the '?' disappears when nothing survives; the fragment (and
    * everything else) is untouched. Returns (stripped, nRemoved).
    */
  def stripTracking(url: String): (String, Int) = {
    val hash = url.indexOf('#')
    val (core, frag) =
      if (hash >= 0) (url.substring(0, hash), url.substring(hash)) else (url, "")
    val q = core.indexOf('?')
    if (q < 0) return (url, 0)
    val params = core.substring(q + 1).split("&", -1)
    val kept = params.filter { kv =>
      val eq = kv.indexOf('=')
      val name = if (eq >= 0) kv.substring(0, eq) else kv
      kv.nonEmpty && !isTracking(name)
    }
    val removed = params.count(_.nonEmpty) - kept.length
    val rebuilt =
      if (kept.isEmpty) core.substring(0, q)
      else core.substring(0, q) + "?" + kept.mkString("&")
    (rebuilt + frag, removed)
  }
}
