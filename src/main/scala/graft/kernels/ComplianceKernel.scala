package graft.kernels

import java.util.Locale

/** Corpus-compliance signals per page: license links, robots-meta
  * directives (including the `noai`/`noimageai` opt-outs), and TDM
  * Reservation Protocol metas — the gates a training-corpus builder
  * applies before a page's text may enter the corpus. All tag-level
  * (one [[HtmlTokenizer]] pass in attrs mode, zero text heuristics):
  *
  *  - `<link rel="license" href=...>` resolved like an outlink; Creative
  *    Commons hrefs normalize to a short code ("by-sa-4.0", "cc0-1.0").
  *  - `<meta name="robots">` content tokens split on comma/space:
  *    noindex / noai / noimageai (public proposals: robots noai
  *    directives; W3C TDM Reservation Protocol community spec).
  *  - `<meta name="tdm-reservation" content="1|0">` per TDMRep.
  *
  * The summary verdict `allowed_training` = no noai AND no TDM
  * reservation — deliberately conservative and tag-driven so the gate
  * is auditable row by row.
  */
object ComplianceKernel {

  final case class Compliance(
      licenseUrl: String,
      ccCode: String,
      noindex: Boolean,
      noai: Boolean,
      noimageai: Boolean,
      tdm: String,
      allowedTraining: Boolean)

  private val CcLicenseRe = java.util.regex.Pattern.compile(
    "creativecommons\\.org/licenses/([a-z\\-]+)/(\\d+\\.\\d+)")
  private val CcZeroRe = java.util.regex.Pattern.compile(
    "creativecommons\\.org/publicdomain/zero/(\\d+\\.\\d+)")

  /** CC short code from a license URL; "" when not a recognized CC href. */
  private[graft] def ccCodeOf(url: String): String = {
    if (url == null || url.isEmpty) return ""
    val m = CcLicenseRe.matcher(url)
    if (m.find()) return m.group(1) + "-" + m.group(2)
    val z = CcZeroRe.matcher(url)
    if (z.find()) return "cc0-" + z.group(1)
    ""
  }

  private final class Sink(pageUrl: String) extends HtmlTokenizer.Sink {
    var licenseHref: String = null
    // robots directives from MULTIPLE metas combine per the de-facto
    // standard (a theme and an SEO plugin each emitting one is common);
    // first-wins would silently drop a later noai/noindex opt-out
    val robotsTokens = scala.collection.mutable.LinkedHashSet.empty[String]
    var tdm: String = null
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = ()
    override def close(name: String): Unit = ()
    override def text(s: CharSequence): Unit = ()
    override def headLink(rel: String, href: String): Unit =
      if (licenseHref == null && HtmlTokenizer.relHas(rel, "license")) licenseHref = href
    override def meta(name: String, content: String): Unit =
      if (name.equalsIgnoreCase("robots")) {
        if (content != null)
          content.toLowerCase(Locale.ROOT).split("[,\\s]+")
            .foreach(t => if (t.nonEmpty) robotsTokens += t.trim)
      } else if (name.equalsIgnoreCase("tdm-reservation")) {
        // most-restrictive wins: any meta reserving TDM rights ("1")
        // overrides a non-reserving one, regardless of document order
        val v = if (content == null) "" else content.trim
        if (tdm == null || (v == "1" && tdm != "1")) tdm = v
      }
  }

  def extract(html: String, pageUrl: String): Compliance = {
    val sink = new Sink(pageUrl)
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    val licenseUrl =
      if (sink.licenseHref == null) ""
      else LinkKernel.resolve(pageUrl, sink.licenseHref).getOrElse("")
    val tokens: Set[String] = sink.robotsTokens.toSet
    val noai = tokens.contains("noai")
    val tdm = if (sink.tdm == null) "" else sink.tdm
    Compliance(
      licenseUrl, ccCodeOf(licenseUrl),
      tokens.contains("noindex"), noai, tokens.contains("noimageai"), tdm,
      allowedTraining = !noai && tdm != "1")
  }
}
