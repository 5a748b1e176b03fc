package graft.kernels

import graft.model.Span
import scala.collection.mutable.ArrayBuffer

/** Minimal deterministic PDF text extraction (SURVEY.md §7.1 `pdfkernel`).
  *
  * Replaces the reference's raster→Azure-OCR path (api.py:127-144,
  * azure_ocr.py:98-140) with direct content-stream parsing — zero egress,
  * zero raster. Scope (SURVEY §7.4 hard part #1, deliberately minimal):
  *  - locates `stream ... endstream` segments; FlateDecode via
  *    java.util.zip.Inflater when the preceding dict says /FlateDecode;
  *  - lexes content streams for text operators BT/ET, Tf (size), and the
  *    positioning ops Td, TD, Tm, TL, T-star, plus the text-showing ops
  *    Tj, TJ, quote; literal `(..)` strings with
  *    escapes and hex `<..>` strings, Latin-1 byte semantics;
  *  - groups positioned runs into lines with the y-cluster rule re-derived
  *    from the reference's dormant `group_lines` (azure_ocr.py:42-82):
  *    two runs share a line when their y distance is < 0.8 × average
  *    text height (azure_ocr.py:55-56 uses 0.8 × mean box height);
  *  - anything outside scope (fonts with CMaps, encrypted files, other
  *    filters) yields no runs and is surfaced via `unsupported`.
  *
  * Pages: each page's content stream is one extraction unit; `pages`
  * returns per-page text in document order (reference per-page loop
  * api.py:217-228).
  */
object PdfTextExtractor {

  final case class Run(x: Double, y: Double, size: Double, text: String)
  final case class PageText(page_no: Int, text: String, spans: Array[Span])
  final case class PdfResult(pages: Array[PageText], unsupported: Int)

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  def extract(bytes: Array[Byte]): PdfResult = {
    val streams = findStreams(bytes)
    val pages = new ArrayBuffer[PageText](4)
    var unsupported = 0
    var pageNo = 0
    streams.foreach { case (data, ok) =>
      if (!ok) unsupported += 1
      else {
        val runs = parseContentStream(data)
        if (runs.nonEmpty) {
          val (text, spans) = assembleLines(runs)
          pages += PageText(pageNo, text, spans)
          pageNo += 1
        }
      }
    }
    PdfResult(pages.toArray, unsupported)
  }

  // ------------------------------------------------------------ stream scan

  /** Find raw stream payloads; decode Flate when declared. Returns
    * (payload, decodable) pairs in file order.
    */
  private def findStreams(bytes: Array[Byte]): ArrayBuffer[(Array[Byte], Boolean)] = {
    val out = new ArrayBuffer[(Array[Byte], Boolean)](4)
    val n = bytes.length
    var i = 0
    while (i < n) {
      val s = indexOf(bytes, "stream", i)
      if (s < 0) { i = n }
      else {
        // dict lookback: from previous "<<" to s
        val dictStart = lastIndexOf(bytes, "<<", s)
        val dict =
          if (dictStart >= 0) new String(bytes, dictStart, s - dictStart, Latin1)
          else ""
        val flate = dict.contains("/FlateDecode")
        val otherFilter = dict.contains("/Filter") && !flate
        // payload starts after "stream" + EOL
        var p = s + 6
        if (p < n && bytes(p) == '\r') p += 1
        if (p < n && bytes(p) == '\n') p += 1
        val e = indexOf(bytes, "endstream", p)
        val end = if (e < 0) n else e
        // trim trailing EOL before "endstream"
        var q = end
        if (q > p && bytes(q - 1) == '\n') q -= 1
        if (q > p && bytes(q - 1) == '\r') q -= 1
        val raw = java.util.Arrays.copyOfRange(bytes, p, math.max(p, q))
        if (otherFilter) out += ((Array.emptyByteArray, false))
        else if (flate) {
          inflate(raw) match {
            case Some(d) => out += ((d, true))
            case None    => out += ((Array.emptyByteArray, false))
          }
        } else out += ((raw, true))
        i = if (e < 0) n else e + 9
      }
    }
    out
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(data)
        val buf = new java.io.ByteArrayOutputStream(data.length * 4)
        val chunk = new Array[Byte](8192)
        var guard = 0
        while (!inf.finished() && guard < (1 << 16)) {
          val k = inf.inflate(chunk)
          if (k == 0 && inf.needsInput()) guard = (1 << 16) // truncated
          else buf.write(chunk, 0, k)
          guard += 1
        }
        Some(buf.toByteArray)
      } finally inf.end()
    } catch { case _: Throwable => None }
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(Latin1)
    var i = math.max(from, 0)
    val last = hay.length - nb.length
    while (i <= last) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val nb = needle.getBytes(Latin1)
    var i = math.min(before, hay.length) - nb.length
    while (i >= 0) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i -= 1
    }
    -1
  }

  // ---------------------------------------------------- content-stream lexer

  /** Parse text-positioning + text-showing operators from one content
    * stream. Postfix operand model: we keep a small operand stack of
    * numbers/strings and dispatch on operator tokens.
    */
  private def parseContentStream(data: Array[Byte]): ArrayBuffer[Run] = {
    val runs = new ArrayBuffer[Run](32)
    val s = new String(data, Latin1)
    val n = s.length
    var i = 0
    // text state
    var x = 0.0; var y = 0.0 // current text position
    var lineX = 0.0; var lineY = 0.0 // start-of-line position
    var leading = 0.0
    var fontSize = 12.0
    var inText = false
    val nums = new ArrayBuffer[Double](8)
    var pendingString: String = null
    val pendingArray = new ArrayBuffer[String](8)
    var inArray = false

    def emit(t: String): Unit =
      if (inText && t.nonEmpty) runs += Run(x, y, fontSize, t)

    def op(name: String): Unit = {
      name match {
        case "BT" => inText = true; x = 0; y = 0; lineX = 0; lineY = 0
        case "ET" => inText = false
        case "Tf" => if (nums.nonEmpty) fontSize = nums.last
        case "TL" => if (nums.nonEmpty) leading = nums.last
        case "Td" =>
          if (nums.length >= 2) {
            lineX += nums(nums.length - 2); lineY += nums.last
            x = lineX; y = lineY
          }
        case "TD" =>
          if (nums.length >= 2) {
            leading = -nums.last
            lineX += nums(nums.length - 2); lineY += nums.last
            x = lineX; y = lineY
          }
        case "Tm" =>
          if (nums.length >= 6) {
            lineX = nums(nums.length - 2); lineY = nums.last
            x = lineX; y = lineY
          }
        case "T*" =>
          lineY -= leading; x = lineX; y = lineY
        case "Tj" =>
          if (pendingString != null) emit(pendingString)
        case "'" =>
          lineY -= leading; x = lineX; y = lineY
          if (pendingString != null) emit(pendingString)
        case "\"" =>
          lineY -= leading; x = lineX; y = lineY
          if (pendingString != null) emit(pendingString)
        case "TJ" =>
          if (pendingArray.nonEmpty) emit(pendingArray.mkString(""))
        case _ => ()
      }
      nums.clear()
      pendingString = null
      pendingArray.clear()
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        // literal string with escapes and balanced parens
        val sb = new java.lang.StringBuilder(32)
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val e = s.charAt(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' => sb.append('('); i += 2
              case ')' => sb.append(')'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                }
                sb.append((v & 0xFF).toChar)
              case '\n' => i += 2 // line continuation
              case other => sb.append(other); i += 2
            }
          } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        val str = sb.toString
        if (inArray) pendingArray += str else pendingString = str
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        // hex string
        val end = s.indexOf('>', i + 1)
        val hex = if (end < 0) s.substring(i + 1) else s.substring(i + 1, end)
        val sb = new java.lang.StringBuilder(hex.length / 2)
        var k = 0
        var hi = -1
        while (k < hex.length) {
          val h = Character.digit(hex.charAt(k), 16)
          if (h >= 0) {
            if (hi < 0) hi = h
            else { sb.append(((hi << 4) | h).toChar); hi = -1 }
          }
          k += 1
        }
        if (hi >= 0) sb.append((hi << 4).toChar)
        val str = sb.toString
        if (inArray) pendingArray += str else pendingString = str
        i = if (end < 0) n else end + 1
      } else if (c == '<') { // '<<' dict begin — skip both
        i += 2
      } else if (c == '[') { inArray = true; pendingArray.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c == '/') { // name object: skip
        i += 1
        while (i < n && !isDelim(s.charAt(i))) i += 1
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < n && { val d = s.charAt(i); d == '.' || (d >= '0' && d <= '9') }) i += 1
        try {
          val v = java.lang.Double.parseDouble(s.substring(start, i))
          if (!inArray) nums += v // TJ kern adjustments ignored for text
        } catch { case _: NumberFormatException => () }
      } else if (c == '%') { // comment to EOL
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (isWsChar(c)) { i += 1 }
      else {
        // operator token
        val start = i
        i += 1
        while (i < n && !isDelim(s.charAt(i))) i += 1
        op(s.substring(start, i))
      }
    }
    runs
  }

  private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0

  private def isDelim(c: Char): Boolean =
    isWsChar(c) || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  // ------------------------------------------------------------ line groups

  /** Group runs into lines: sort by descending y (PDF origin bottom-left),
    * merge while y-distance < 0.8 × mean text height (azure_ocr.py:55-56
    * semantics), sort within a line by x, join with single spaces; lines
    * join with '\n'. Emits one Span per line.
    */
  private def assembleLines(runs: ArrayBuffer[Run]): (String, Array[Span]) = {
    val sorted = runs.toArray.sortBy(r => (-r.y, r.x))
    val avgH =
      if (sorted.isEmpty) 12.0
      else sorted.map(_.size).sum / sorted.length
    val thr = 0.8 * avgH
    val lines = new ArrayBuffer[ArrayBuffer[Run]](16)
    var i = 0
    while (i < sorted.length) {
      val r = sorted(i)
      if (lines.nonEmpty && math.abs(lines.last.head.y - r.y) < thr) lines.last += r
      else lines += ArrayBuffer(r)
      i += 1
    }
    val out = new java.lang.StringBuilder(256)
    val spans = new ArrayBuffer[Span](lines.length)
    lines.foreach { lr =>
      val lineText = lr.sortBy(_.x).map(_.text).mkString(" ")
      val norm = normalizeWs(lineText)
      if (norm.nonEmpty) {
        if (out.length > 0) out.append('\n')
        val begin = out.length
        out.append(norm)
        spans += Span(begin, out.length, "line")
      }
    }
    (out.toString, spans.toArray)
  }

  private def normalizeWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pending = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\f') pending = true
      else {
        if (pending && sb.length > 0) sb.append(' ')
        sb.append(c)
        pending = false
      }
      i += 1
    }
    sb.toString
  }
}
