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

  test("property: segment-then-join round-trips every non-UNK word") {
    // r4 ask #8: for ANY word, either the segmentation is [UNK] or
    // stripping ## markers and concatenating reproduces the word — and
    // pure a-z words are never UNK (single-letter totality).
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def roundTrips(w: String): Boolean = {
      val ps = segment(w)
      if (ps == Seq(Unk)) true
      else ps.map(_.stripPrefix("##")).mkString == w &&
        // word-initial piece is unmarked, all others marked
        ps.zipWithIndex.forall { case (p, i) => (i == 0) == !p.startsWith("##") }
    }
    val az = Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, Gen.choose('a', 'z')).map(_.mkString))
    val any = Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, Gen.choose(' ', '~')).map(_.mkString))
    val r1 = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(az)(w => roundTrips(w) && segment(w) != Seq(Unk)))
    assert(r1.passed, s"a-z words: $r1")
    val r2 = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(any)(roundTrips))
    assert(r2.passed, s"arbitrary words: $r2")
  }
}
