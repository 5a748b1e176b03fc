package graft.kernels

/** Head-metadata extraction: title / meta description / OpenGraph title /
  * canonical URL — the page-level fields a corpus builder keys, dedups,
  * and labels on before body text enters the pipeline. Runs the same
  * single-pass [[HtmlTokenizer]] as text/link extraction (attrs mode);
  * first occurrence wins per field, matching how crawlers treat
  * duplicated head tags. Canonical hrefs resolve against the page URL
  * with the same RFC 3986 rules as outlinks ([[LinkKernel.resolve]]).
  */
object MetaKernel {

  /** All fields "" when absent — a fixed-shape row, never nulls, so the
    * downstream schema is stable under Catalyst.
    */
  final case class PageMeta(
      title: String, description: String, ogTitle: String, canonical: String)

  private final class MetaSink(pageUrl: String) extends HtmlTokenizer.Sink {
    private var inTitle = false
    private var titleDone = false
    private val titleBuf = new java.lang.StringBuilder(64)
    var desc: String = null
    var og: String = null
    var canon: String = null

    override def open(name: String, classId: String, selfClosing: Boolean): Unit =
      // a self-closing <title/> never gets a close event — treating it
      // as a title would swallow the rest of the document's text
      if (name == "title" && !titleDone && !selfClosing) inTitle = true
    override def close(name: String): Unit =
      if (name == "title" && inTitle) { inTitle = false; titleDone = true }
    override def text(s: CharSequence): Unit =
      if (inTitle) titleBuf.append(s)
    override def meta(name: String, content: String): Unit =
      if (name.equalsIgnoreCase("description")) {
        if (desc == null) desc = content
      } else if (name.equalsIgnoreCase("og:title")) {
        if (og == null) og = content
      }
    override def headLink(rel: String, href: String): Unit =
      if (canon == null && HtmlTokenizer.relHas(rel, "canonical"))
        canon = LinkKernel.resolve(pageUrl, href).getOrElse(null)

    /** title is RCDATA: raw-text delivery skips entity decoding (script/
      * style must stay verbatim), so the title decodes here — BEFORE
      * whitespace collapse, matching the lexer's body-text order, so
      * entity-produced whitespace (&#10;, &nbsp;) collapses like any
      * other whitespace.
      */
    def title: String =
      HtmlTokenizer.collapseWs(HtmlTokenizer.decodeEntities(titleBuf.toString))
  }

  private def orEmpty(s: String): String = if (s == null) "" else s

  def extract(html: String, pageUrl: String): PageMeta = {
    val sink = new MetaSink(pageUrl)
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    PageMeta(sink.title, orEmpty(sink.desc), orEmpty(sink.og), orEmpty(sink.canon))
  }
}
