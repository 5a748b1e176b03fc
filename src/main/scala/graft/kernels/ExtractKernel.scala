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

  /** Transport codec sniff — crawl tables frequently store the raw
    * compressed response body; the payload is decompressed transparently
    * before content sniffing (the CONTENT type is whatever is inside).
    * gzip (1f 8b) and zstd (28 b5 2f fd — zstd-jni ships with Spark)
    * are the two codecs real crawl archives use.
    */
  def transportOf(b: Array[Byte]): String = {
    if (b == null || b.length < 4) null
    else if (b(0) == 0x1f.toByte && (b(1) & 0xff) == 0x8b) "gzip"
    else if (b(0) == 0x28.toByte && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd) "zstd"
    else null
  }

  def isGzip(b: Array[Byte]): Boolean = transportOf(b) == "gzip"

  /** Bounded transport decompression; None on corrupt/truncated/
    * oversized streams (decompression-bomb guard).
    */
  def decompressTransport(bytes: Array[Byte],
      maxOut: Int = 64 * 1024 * 1024): Option[Array[Byte]] =
    try {
      val in: java.io.InputStream = transportOf(bytes) match {
        case "gzip" =>
          new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
        case "zstd" =>
          new com.github.luben.zstd.ZstdInputStream(new java.io.ByteArrayInputStream(bytes))
        case _ => return None
      }
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      var total = 0L
      while (n >= 0 && total <= maxOut) {
        out.write(chunk, 0, n)
        total += n
        n = in.read(chunk)
      }
      in.close()
      if (total > maxOut) None else Some(out.toByteArray)
    } catch { case _: Throwable => None }

  /** Back-compat alias (gzip only). */
  def gunzip(bytes: Array[Byte], maxOut: Int = 64 * 1024 * 1024): Option[Array[Byte]] =
    if (isGzip(bytes)) decompressTransport(bytes, maxOut) else None

  /** Extract all pages of one input row. HTML and passthrough rows emit
    * exactly one page (page_no 0); PDFs emit one page per content stream.
    */
  def extractPages(row0: PageRow): Iterator[ExtractedPage] = {
    // transparent transport decode (content sniffing happens on the
    // decompressed payload); a corrupt compressed body is an error row,
    // never a task failure
    val codec = transportOf(row0.html)
    val row =
      if (codec == null) row0
      else decompressTransport(row0.html) match {
        case Some(b) => row0.copy(html = b)
        case None =>
          return Iterator.single(ExtractedPage(row0.url, 0, row0.warc_ts,
            KindHtml, "", Seq.empty, s"${codec}_corrupt"))
      }
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
