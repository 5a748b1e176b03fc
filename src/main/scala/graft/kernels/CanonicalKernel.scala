package graft.kernels

/** `<link rel="canonical">` extraction — the page-declared dedup signal
  * search engines and crawl pipelines honor BEFORE any content-based
  * near-dup pass: syndicated copies, tracking-parameter variants and
  * pagination views all point at one canonical URL, so grouping by it
  * collapses whole duplicate families for free (no shingles, no
  * signatures). De-facto semantics (Google's documented handling):
  * the FIRST canonical link in head order wins when several are
  * present; `rel` is a whitespace token list ([[HtmlTokenizer.relHas]],
  * case-insensitive); the href resolves like any outlink (relative and
  * protocol-relative forms are common in the wild); a page without a
  * canonical link is its own canonical.
  *
  * One tokenizer pass in attrs mode, no text heuristics — a pure
  * per-row kernel with zero shuffle until the caller groups by target.
  */
object CanonicalKernel {

  private final class Sink extends HtmlTokenizer.Sink {
    var href: String = null
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = ()
    override def close(name: String): Unit = ()
    override def text(s: CharSequence): Unit = ()
    override def headLink(rel: String, href0: String): Unit =
      if (href == null && HtmlTokenizer.relHas(rel, "canonical")) href = href0
    override def meta(name: String, content: String): Unit = ()
  }

  /** Resolved canonical URL of the page, or `pageUrl` itself when no
    * canonical link is present or its href does not resolve.
    */
  def canonicalUrl(html: String, pageUrl: String): String = {
    val sink = new Sink
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    if (sink.href == null) pageUrl
    else LinkKernel.resolve(pageUrl, sink.href).getOrElse(pageUrl)
  }
}
