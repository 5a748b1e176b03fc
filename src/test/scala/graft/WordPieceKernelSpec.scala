package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.WordPieceKernel.{segment, Unk}

/** Greedy longest-match-first semantics pins for the WordPiece kernel. */
class WordPieceKernelSpec extends AnyFunSuite {

  test("longest match wins at every position") {
    assert(segment("column") === Seq("col", "##umn"))
    assert(segment("order") === Seq("or", "##der")) // not o ##r ##der
    assert(segment("query") === Seq("qu", "##ery"))
    assert(segment("window") === Seq("win", "##dow"))
    // continuation longest-first: ##up beats ##u ##p
    assert(segment("group") === Seq("gr", "##o", "##up"))
    assert(segment("scan") === Seq("scan")) // whole-word entry
  }

  test("single-letter fallback keeps a-z total; unknown chars become [UNK]") {
    assert(segment("zzz") === Seq("z", "##z", "##z"))
    assert(segment("Order") === Seq(Unk)) // uppercase not in vocab
    assert(segment("a1") === Seq(Unk))    // digit unmatched mid-word
    assert(segment("") === Seq.empty)
  }

  test("piece concatenation reconstructs the word exactly (no char lost)") {
    Seq("column", "merge", "aggregate", "partition", "windowing").foreach { w =>
      val ps = segment(w)
      if (ps != Seq(Unk))
        assert(ps.map(_.stripPrefix("##")).mkString === w, s"word $w -> $ps")
    }
  }
}
