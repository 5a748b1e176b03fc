package graft.kernels

import scala.collection.immutable.VectorBuilder

/** HTML table extraction: top-level `<table>` cells as structured
  * (table, row, col, text, header) records — the structured-data
  * counterpart to main-text extraction (boilerplate-strip throws tables
  * away; a corpus builder harvests them). Same single-pass
  * [[HtmlTokenizer]]; text arrives entity-decoded. Scope: rectangular
  * harvest — nested tables are skipped (their cells belong to layout,
  * not data), rowspan/colspan are not expanded (the raw grid position is
  * emitted, which downstream normalization can widen).
  *
  * Omitted `</td>`/`</tr>` (legal HTML) are handled by implicit close:
  * a new cell/row/table boundary flushes the open cell.
  */
object TableKernel {

  final case class Cell(table: Int, row: Int, col: Int, text: String, header: Boolean)

  private final class TableSink extends HtmlTokenizer.Sink {
    val out = new VectorBuilder[Cell]
    private var depth = 0 // nesting depth of <table>
    private var tableIdx = -1
    private var rowIdx = -1
    private var colIdx = -1
    private var collecting = false
    private var isHeader = false
    private val buf = new java.lang.StringBuilder(32)

    private def flushCell(): Unit = if (collecting) {
      out += Cell(tableIdx, rowIdx, colIdx, HtmlTokenizer.collapseWs(buf), isHeader)
      buf.setLength(0)
      collecting = false
    }

    override def open(name: String, classId: String, selfClosing: Boolean): Unit =
      name match {
        case "table" =>
          // a self-closing <table/> gets no close event; counting it
          // would leak depth and drop every later table as "nested"
          if (!selfClosing) {
            if (depth == 0) { flushCell(); tableIdx += 1; rowIdx = -1; colIdx = -1 }
            else flushCell() // nested table: close the outer cell's text run
            depth += 1
          }
        case "tr" if depth == 1 =>
          flushCell(); rowIdx += 1; colIdx = -1
        case "td" | "th" if depth == 1 =>
          flushCell()
          if (rowIdx < 0) rowIdx = 0 // cells before any <tr>: implicit row
          colIdx += 1
          collecting = true
          isHeader = name == "th"
          if (selfClosing) flushCell() // <td/>: an empty cell, closed now
        case _ => ()
      }

    override def close(name: String): Unit = name match {
      case "table" =>
        if (depth == 1) flushCell()
        if (depth > 0) depth -= 1
      case "tr" | "td" | "th" if depth == 1 => flushCell()
      case _ => ()
    }

    override def text(s: CharSequence): Unit =
      if (collecting && depth == 1) buf.append(s)

    def end(): Unit = flushCell()
  }

  def extract(html: String): Vector[Cell] = {
    val sink = new TableSink
    HtmlTokenizer.tokenize(html, sink)
    sink.end()
    sink.out.result()
  }
}
