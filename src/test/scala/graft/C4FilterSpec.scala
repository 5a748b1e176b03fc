package graft

import graft.kernels.C4Filter
import org.scalatest.funsuite.AnyFunSuite

/** C4 rule-engine contracts on hand-written pages (the oracle gate
  * covers the generated shapes).
  */
class C4FilterSpec extends AnyFunSuite {

  test("terminal punctuation set: . ! ? \" and curly close-quote keep") {
    val r = C4Filter.filterLines(
      "This line has five words.\nAnother line has five words!\n" +
        "Does this line have five?\nHe said five words like \"this\"\n" +
        "Curly quoted line of words”\nno terminal punctuation five words")
    assert(r.nKept === 5L && r.droppedPunct === 1L)
  }

  test("five-word minimum counts words, not characters") {
    val r = C4Filter.filterLines("Four words are here.\nBut this one has five words.")
    assert(r.nKept === 1L && r.droppedShort === 1L)
  }

  test("javascript rule is case-insensitive and page rules trump everything") {
    val js = C4Filter.filterLines("Please enable JavaScript to continue here.")
    assert(js.droppedJs === 1L && js.nKept === 0L)
    val lorem = C4Filter.filterLines(
      "A perfectly good line with words.\nLorem Ipsum is dummy text everywhere.")
    assert(lorem.pageDropped && lorem.kept === "")
    assert(C4Filter.filterLines("code block { return 1; } words here.").pageDropped)
  }

  test("blank lines are not counted; kept lines keep their order, trimmed") {
    val r = C4Filter.filterLines(
      "  First good line has words.  \n\n\nSecond good line has words.")
    assert(r.nLines === 2L && r.nKept === 2L)
    assert(r.kept === "First good line has words.\nSecond good line has words.")
  }

  test("totality on empty and whitespace-only input") {
    assert(C4Filter.filterLines("") === C4Filter.Result("", 0, 0, 0, 0, 0, false))
    assert(C4Filter.filterLines(" \n \n ").nLines === 0L)
  }
}
