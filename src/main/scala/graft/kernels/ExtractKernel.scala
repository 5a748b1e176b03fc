package graft.kernels

import graft.model.{ExtractedPage, PageRow, Span}

/** Per-row extraction dispatch: content sniffing + kernel invocation +
  * poison-pill isolation (SURVEY §2.2 "extension dispatch" re-expressed as
  * content sniffing on magic bytes — the reference dispatched on filename
  * extension, api.py:123-125; we dispatch on `%PDF-` vs HTML-ish bytes).
  *
  * Errors never fail the Spark task: a failing document emits a row with
  * `error` set and empty text (reference analog: per-request try/except,
  * api.py:291-336).
  */
object ExtractKernel {

  final val KindHtml = "html"
  final val KindPdf = "pdf"
  final val KindPassthrough = "passthrough"
  final val KindEmpty = "empty"

  def sniff(html: Array[Byte]): String = {
    if (html == null || html.length == 0) KindPassthrough
    else if (html.length >= 5 &&
      html(0) == '%' && html(1) == 'P' && html(2) == 'D' &&
      html(3) == 'F' && html(4) == '-') KindPdf
    else KindHtml
  }

  /** Extract all pages of one input row. HTML and passthrough rows emit
    * exactly one page (page_no 0); PDFs emit one page per content stream.
    */
  def extractPages(row: PageRow): Iterator[ExtractedPage] = {
    try {
      sniff(row.html) match {
        case KindPassthrough =>
          val t = if (row.text == null) "" else row.text
          val kind = if (t.isEmpty) KindEmpty else KindPassthrough
          val spans =
            if (t.isEmpty) Seq.empty[Span] else Seq(Span(0, t.length, "text"))
          Iterator.single(ExtractedPage(row.url, 0, row.warc_ts, kind, t, spans, null))
        case KindPdf =>
          val res = PdfTextExtractor.extract(row.html)
          if (res.pages.isEmpty) {
            val err =
              if (res.unsupported > 0) s"pdf_unsupported:${res.unsupported}"
              else "pdf_empty"
            Iterator.single(
              ExtractedPage(row.url, 0, row.warc_ts, KindPdf, "", Seq.empty, err))
          } else {
            res.pages.iterator.map { p =>
              ExtractedPage(row.url, p.page_no, row.warc_ts, KindPdf, p.text,
                p.spans.toSeq, null)
            }
          }
        case _ =>
          val html = HtmlCharset.decode(row.html)
          val ex = MainTextExtractor.extract(html)
          Iterator.single(
            ExtractedPage(row.url, 0, row.warc_ts, KindHtml, ex.text, ex.spans.toSeq, null))
      }
    } catch {
      case e: Throwable =>
        Iterator.single(ExtractedPage(row.url, 0, row.warc_ts, sniff(row.html), "",
          Seq.empty, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
    }
  }
}
