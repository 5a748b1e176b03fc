package graft.kernels

import java.util.Locale

/** Internationalization harvest per page: the declared language
  * (`<html lang>`, BCP 47 tag normalized to its lowercase primary
  * subtag), the OpenGraph locale, and the rel=alternate hreflang
  * cluster — the signals a multilingual corpus uses to group language
  * variants of one document and to cross-check detected language
  * against what the page claims. One [[HtmlTokenizer]] pass (attrs
  * mode); alternates resolve like outlinks; rel=alternate links WITHOUT
  * hreflang (RSS/Atom discovery) are not language alternates and are
  * excluded.
  */
object I18nKernel {

  final case class PageI18n(
      htmlLang: String, // primary subtag, lowercase ("en-US" → "en")
      htmlLangRaw: String, // as declared
      ogLocale: String,
      alternates: List[(String, String)]) // (hreflang lowercase, resolved url)

  private final class Sink(pageUrl: String) extends HtmlTokenizer.Sink {
    var lang: String = null
    var og: String = null
    val alts = new scala.collection.mutable.ArrayBuffer[(String, String)](4)
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = ()
    override def close(name: String): Unit = ()
    override def text(s: CharSequence): Unit = ()
    override def htmlLang(l: String): Unit = if (lang == null) lang = l
    override def meta(name: String, content: String): Unit =
      if (og == null && name.equalsIgnoreCase("og:locale")) og = content
    override def headLinkLang(rel: String, href: String, hreflang: String): Unit =
      if (HtmlTokenizer.relHas(rel, "alternate") && hreflang.nonEmpty)
        LinkKernel.resolve(pageUrl, href).foreach { u =>
          alts += ((hreflang.toLowerCase(Locale.ROOT), u))
        }
  }

  /** BCP 47 primary subtag, lowercase; "" for empty/absent. */
  private[graft] def primarySubtag(tag: String): String = {
    if (tag == null) return ""
    val t = tag.trim.toLowerCase(Locale.ROOT)
    val dash = t.indexOf('-')
    val p = if (dash >= 0) t.substring(0, dash) else t
    if (p.forall(c => c >= 'a' && c <= 'z') && p.nonEmpty) p else ""
  }

  def extract(html: String, pageUrl: String): PageI18n = {
    val sink = new Sink(pageUrl)
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    PageI18n(
      primarySubtag(sink.lang),
      if (sink.lang == null) "" else sink.lang.trim,
      if (sink.og == null) "" else sink.og,
      sink.alts.toList)
  }
}
