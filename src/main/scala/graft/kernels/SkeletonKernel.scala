package graft.kernels

/** DOM structure skeleton — the tag-sequence fingerprint that template
  * clustering keys on: pages generated from one CMS template share a
  * skeleton even when their text differs entirely, so grouping by
  * skeleton per host finds the template set (and a host whose pages are
  * all ONE skeleton is machine-generated chrome — a boilerplate
  * signal). One tokenizer pass; open-tag names in document order,
  * capped (the head of the structure identifies the template; an
  * unbounded tail would make the fingerprint row arbitrarily wide).
  */
object SkeletonKernel {

  val DefaultCap = 80

  def skeleton(html: String, cap: Int = DefaultCap): String = {
    val tags = new scala.collection.mutable.ArrayBuffer[String](32)
    HtmlTokenizer.tokenize(html, new HtmlTokenizer.Sink {
      override def open(name: String, classId: String, selfClosing: Boolean): Unit =
        if (tags.size < cap) tags += name
      override def close(name: String): Unit = ()
      override def text(s: CharSequence): Unit = ()
    })
    tags.mkString(",")
  }
}
