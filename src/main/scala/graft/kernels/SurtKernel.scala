package graft.kernels

import java.util.Locale

/** SURT (Sort-friendly URI Reordering Transform) — the public
  * Common Crawl / OpenWayback index-key convention: URLs of one
  * registered domain sort adjacently, so a CDX-style index over 10^12
  * URLs can range-scan a whole site.
  *
  *   http://www.Example.COM/A/b?b=2&a=1  →  com,example)/A/b?a=1&b=2
  *
  * Rules (per the public SURT spec + CC's canonicalizer): scheme
  * dropped, host lowercased, a leading `www.` stripped, host labels
  * reversed and comma-joined, `)` separator, path kept (case
  * preserved — paths are case-significant), default ports stripped
  * (80/http, 443/https), query parameters sorted bytewise and
  * re-joined, fragment dropped.
  */
object SurtKernel {

  def surtKey(url: String): String = {
    if (url == null || url.isEmpty) return ""
    var s = url
    val hashIdx = s.indexOf('#')
    if (hashIdx >= 0) s = s.substring(0, hashIdx)
    var scheme = ""
    val se = s.indexOf("://")
    if (se >= 0) { scheme = s.substring(0, se).toLowerCase(Locale.ROOT); s = s.substring(se + 3) }
    val pathIdx = s.indexOf('/')
    val qIdx = s.indexOf('?')
    val hostEnd = {
      val cands = Seq(pathIdx, qIdx).filter(_ >= 0)
      if (cands.isEmpty) s.length else cands.min
    }
    var host = s.substring(0, hostEnd).toLowerCase(Locale.ROOT)
    val rest = s.substring(hostEnd)
    // default port strip
    val colon = host.lastIndexOf(':')
    if (colon >= 0) {
      val port = host.substring(colon + 1)
      if ((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
        host = host.substring(0, colon)
    }
    if (host.startsWith("www.")) host = host.substring(4)
    val reversed = host.split("\\.").reverse.mkString(",")
    // split path / query, sort query params bytewise
    val (path, query) = {
      val q = rest.indexOf('?')
      if (q < 0) (rest, "")
      else (rest.substring(0, q), rest.substring(q + 1))
    }
    val sortedQuery =
      if (query.isEmpty) ""
      else "?" + query.split("&").filter(_.nonEmpty).sorted.mkString("&")
    val pathPart = if (path.isEmpty) "/" else path
    reversed + ")" + pathPart + sortedQuery
  }
}
