package graft.kernels

/** `<meta http-equiv="refresh">` client-side redirects — the third
  * redirect mechanism a crawler must follow after HTTP 3xx and
  * `<link rel=canonical>`; parked/moved pages use it heavily. Content
  * grammar per the WHATWG shared declarative refresh steps: a delay
  * number, then optionally `;`/`,` + whitespace + an optional
  * case-insensitive `url=` prefix + the target (quotes stripped). A
  * refresh without a URL is a pure reload, not a redirect.
  */
object RefreshKernel {

  /** (delaySeconds, rawUrl) — rawUrl "" for a reload-only refresh;
    * None when the content doesn't parse as a refresh at all.
    */
  private[graft] def parse(content: String): Option[(Long, String)] = {
    if (content == null) return None
    val s = content.trim
    var i = 0
    while (i < s.length && Character.isDigit(s.charAt(i))) i += 1
    if (i == 0) return None
    val delay = s.substring(0, i).toLongOption.getOrElse(return None)
    // WHATWG: an optional fraction is parsed and discarded
    if (i < s.length && s.charAt(i) == '.') {
      i += 1
      while (i < s.length && Character.isDigit(s.charAt(i))) i += 1
    }
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    if (i < s.length && (s.charAt(i) == ';' || s.charAt(i) == ',')) i += 1
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    var rest = s.substring(i)
    if (rest.length >= 4 && rest.substring(0, 3).equalsIgnoreCase("url")) {
      val afterUrl = rest.substring(3).dropWhile(Character.isWhitespace)
      if (afterUrl.startsWith("="))
        rest = afterUrl.substring(1).dropWhile(Character.isWhitespace)
    }
    rest = rest.trim
    // WHATWG: a leading quote collects up to the MATCHING quote or end
    // of string (truncated attributes are everywhere in crawl soup)
    if (rest.nonEmpty && (rest.head == '"' || rest.head == '\'')) {
      val q = rest.head
      val end = rest.indexOf(q, 1)
      rest = (if (end >= 0) rest.substring(1, end) else rest.substring(1)).trim
    }
    Some((delay, rest))
  }

  private final class Sink extends HtmlTokenizer.Sink {
    var content: String = null
    override def open(name: String, classId: String, selfClosing: Boolean): Unit = ()
    override def close(name: String): Unit = ()
    override def text(s: CharSequence): Unit = ()
    override def meta(name: String, c: String): Unit =
      if (content == null && name.equalsIgnoreCase("refresh")) content = c
  }

  /** (delaySeconds, resolvedTarget) — None when the page has no
    * url-bearing refresh (reload-only refreshes are not redirects).
    */
  def extract(html: String, pageUrl: String): Option[(Long, String)] = {
    val sink = new Sink
    HtmlTokenizer.tokenize(html, sink, attrs = true)
    parse(sink.content).flatMap { case (delay, raw) =>
      if (raw.isEmpty) None
      else LinkKernel.resolve(pageUrl, raw).map(u => (delay, u))
    }
  }
}
