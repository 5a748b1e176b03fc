package graft.kernels

import java.util.Locale

/** The C4 cleaning rules (Raffel et al. 2020, §2.2 — public method):
  * line-level — keep only lines that end in a terminal punctuation mark,
  * have ≥5 words, and do not contain the word "javascript"; page-level —
  * drop any page containing "lorem ipsum" or a "{" (code). The
  * dirty-word blocklist page rule is intentionally not carried (no
  * public canonical list ships here; the hook is the same page-level
  * gate). Pure JVM, zero Spark imports; one pass per line.
  */
object C4Filter {

  final case class Result(
      kept: String,
      nLines: Long,
      nKept: Long,
      droppedPunct: Long,
      droppedShort: Long,
      droppedJs: Long,
      pageDropped: Boolean)

  private def endsTerminal(line: String): Boolean = {
    if (line.isEmpty) return false
    val c = line.charAt(line.length - 1)
    c == '.' || c == '!' || c == '?' || c == '"' || c == '”'
  }

  private def wordCount(line: String): Int = {
    var n = 0
    var inWord = false
    var i = 0
    while (i < line.length) {
      val ws = Character.isWhitespace(line.charAt(i))
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }

  def filterLines(text: String): Result = {
    val lower = text.toLowerCase(Locale.ROOT)
    val pageDropped = lower.contains("lorem ipsum") || text.indexOf('{') >= 0
    val lines = text.split("\n", -1)
    val kept = new scala.collection.mutable.ArrayBuffer[String](lines.length)
    var nLines = 0L; var nKept = 0L
    var dPunct = 0L; var dShort = 0L; var dJs = 0L
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty) {
        nLines += 1
        if (!endsTerminal(line)) dPunct += 1
        else if (wordCount(line) < 5) dShort += 1
        else if (line.toLowerCase(Locale.ROOT).contains("javascript")) dJs += 1
        else { nKept += 1; kept += line }
      }
    }
    Result(if (pageDropped) "" else kept.mkString("\n"),
      nLines, nKept, dPunct, dShort, dJs, pageDropped)
  }
}
