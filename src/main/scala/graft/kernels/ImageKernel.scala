package graft.kernels

/** Image-text pair harvest — the LAION-style mining step that turns
  * crawl HTML into (image URL, alt text) training pairs. One
  * [[HtmlTokenizer]] pass (attrs mode):
  *
  *  - `src` resolves like an outlink; when absent, the lazy-load
  *    `data-src` is the fallback (the dominant real-world pattern for
  *    below-the-fold images).
  *  - `srcset` parses per the HTML spec's comma-separated candidate
  *    grammar (`url 2x` / `url 640w`); the harvest keeps the variant
  *    count and the HIGHEST-DENSITY/WIDEST candidate resolved (the one
  *    an image-corpus fetcher wants).
  *  - `alt` arrives entity-decoded; whitespace collapses like body
  *    text. Images with no URL at all (decorative/no-src) are skipped.
  */
object ImageKernel {

  final case class ImgRef(
      url: String, alt: String, nVariants: Int, bestVariant: String)

  /** Parse a srcset value into (url, numeric descriptor weight) —
    * `2x` → 2·10⁶ (density scaled), `640w` → 640 (width), bare URL →
    * weight 1x (10⁶). Malformed descriptors skip their candidate.
    *
    * Follows the HTML spec's candidate grammar rather than a naive
    * comma split: URLs are whitespace-delimited (so a data URI's
    * internal commas survive), a TRAILING comma on a URL ends a
    * descriptor-less candidate, and a comma inside a descriptor token
    * separates it from the next candidate's URL.
    */
  private[graft] def parseSrcset(srcset: String): List[(String, Long)] = {
    if (srcset == null || srcset.isEmpty) return Nil
    val out = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val toks = scala.collection.mutable.Queue(
      srcset.split("\\s+").iterator.filter(_.nonEmpty).toSeq: _*)
    def parseDesc(desc0: String): Option[Long] = {
      val desc = desc0.toLowerCase(java.util.Locale.ROOT)
      if (desc.isEmpty) Some(1000000L)
      else if (desc.endsWith("x"))
        desc.dropRight(1).toDoubleOption.map(d => (d * 1000000L).toLong)
      else if (desc.endsWith("w")) desc.dropRight(1).toLongOption
      else None
    }
    while (toks.nonEmpty) {
      var url = toks.dequeue().dropWhile(_ == ',')
      if (url.nonEmpty) {
        if (url.endsWith(",")) {
          out += ((url.reverse.dropWhile(_ == ',').reverse, 1000000L))
        } else if (toks.isEmpty) {
          out += ((url, 1000000L))
        } else {
          val t = toks.dequeue()
          val comma = t.indexOf(',')
          val desc = if (comma >= 0) t.substring(0, comma) else t
          val rest = if (comma >= 0) t.substring(comma + 1) else ""
          parseDesc(desc).foreach(w => out += ((url, w)))
          if (rest.nonEmpty) toks.prepend(rest) // next candidate's URL
        }
      }
    }
    out.toList
  }

  private final class Sink(pageUrl: String) extends HtmlTokenizer.Sink {
    val imgs = new scala.collection.mutable.ArrayBuffer[ImgRef](8)
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = ()
    override def close(name: String): Unit = ()
    override def text(s: CharSequence): Unit = ()
    override def image(src: String, alt: String, srcset: String, dataSrc: String): Unit = {
      val eff = if (src.nonEmpty) src else dataSrc
      val variants = parseSrcset(srcset)
      val resolved =
        if (eff.nonEmpty) LinkKernel.resolve(pageUrl, eff).getOrElse("")
        else ""
      // srcset-only images (no src/data-src): the first candidate is
      // the effective URL per the spec's fallback behavior
      val url =
        if (resolved.nonEmpty) resolved
        else variants.headOption
          .flatMap(v => LinkKernel.resolve(pageUrl, v._1)).getOrElse("")
      if (url.nonEmpty) {
        val best = variants
          .sortBy { case (u, wgt) => (-wgt, u) }
          .headOption.flatMap(v => LinkKernel.resolve(pageUrl, v._1)).getOrElse("")
        imgs += ImgRef(url, HtmlTokenizer.collapseWs(alt), variants.size, best)
      }
    }
  }

  def extract(html: String, pageUrl: String): List[ImgRef] = {
    val sink = new Sink(pageUrl)
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    sink.imgs.toList
  }
}
