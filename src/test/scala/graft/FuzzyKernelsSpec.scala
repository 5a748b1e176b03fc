package graft

import graft.kernels.FuzzyKernels._
import org.scalatest.funsuite.AnyFunSuite

/** Parity tests against CPython difflib/fuzzywuzzy ground truth (vectors
  * computed by running stdlib difflib with the fuzzywuzzy formulas).
  */
class FuzzyKernelsSpec extends AnyFunSuite {

  test("ratio: exact difflib parity incl. half-even rounding") {
    assert(ratio("new york mets", "new york mets") === 100)
    assert(ratio("new york mets", "new YORK mets!!") === 64)
    assert(ratio("great is scala", "scala is great") === 36)
    assert(ratio("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") === 91)
    assert(ratio("mediterranean gulf", "gulf med") === 31)
    assert(ratio("dammam scan center", "DAMMAM SCAN CENTER - DAMMAM") === 9)
    assert(ratio("consultation", "consultation visit") === 80)
    assert(ratio("abcd", "zyxw") === 0)
    assert(ratio("", "") === 100) // difflib ratio of two empties is 1.0
    assert(ratio("a", "") === 0)
  }

  test("token_sort_ratio: exact fuzzywuzzy parity") {
    assert(tokenSortRatio("new york mets", "new YORK mets!!") === 100)
    assert(tokenSortRatio("great is scala", "scala is great") === 100)
    assert(tokenSortRatio("mediterranean gulf", "gulf med") === 62)
    assert(tokenSortRatio("dammam scan center", "DAMMAM SCAN CENTER - DAMMAM") === 84)
    assert(tokenSortRatio("consultation", "consultation visit") === 80)
    assert(tokenSortRatio("Duplex ultrasound of vessels", "duplex ultrasound vessels of") === 100)
    assert(tokenSortRatio("", "") === 100)
  }

  test("token_sort_ratio: non-ASCII parity (force_ascii=True semantics)") {
    // fuzzywuzzy's default force_ascii=True runs asciidammit, which under
    // Python 3 drops ONLY U+0080..U+00FF (Latin-1 accents disappear) and
    // keeps all other Unicode. Ground truth: stdlib difflib + the
    // replicated full_process pipeline (same construction as the ASCII
    // vectors above).
    assert(tokenSortRatio("café", "cafe") === 86)            // é dropped: caf vs cafe
    assert(tokenSortRatio("café au lait", "cafe lait au") === 96)
    assert(tokenSortRatio("naïve approach", "naive approach") === 96)
    assert(tokenSortRatio("résumé 2024", "resume 2024") === 90)
    assert(tokenSortRatio("Ångström unit", "Angstrom unit") === 92)
    // Arabic is OUTSIDE the bad_chars range: survives intact, so a token
    // permutation still scores 100 and a one-char deletion scores like ASCII
    assert(tokenSortRatio("مرحبا بالعالم", "بالعالم مرحبا") === 100)
    assert(tokenSortRatio("مرحبا", "مرحب") === 89)
  }

  test("bestDropdownMatch: carrier cleaning, 60-threshold, double-check (python-verified)") {
    val chunks = List("Med Gulf", "Mediterranean Gulf", "Gulf Med", "Gulf",
      "Med", "Gulf", "Mediterranean")
    val keyInput = "Mediterranean Gulf Med Gulf"
    val far = Seq("01-SA-MedGulf Insurance-Riyadh", "02-SA-Bupa Arabia", "Tawuniya")
    // best chunk score is 38 (< 60) → no selection
    assert(bestDropdownMatch(chunks, keyInput, far, carrierStyle = true).isEmpty)
    // an exact-cleaned option pushes a chunk to 100 → original returned
    val near = far :+ "03-SA-Med Gulf"
    assert(bestDropdownMatch(chunks, keyInput, near, carrierStyle = true)
      === Some("03-SA-Med Gulf"))
    assert(cleanOptionCarrier("01-SA-MedGulf Insurance-Riyadh") === "MedGulf Insurance-Riyadh")
    assert(cleanOptionCarrier("02-SA-Bupa Arabia") === "Bupa Arabia")
    assert(cleanOptionCarrier("Tawuniya") === "Tawuniya")
  }

  test("wordVoteBest: >=90 ratio word votes, argmax first-wins (python-verified)") {
    val options = Seq("CT Scan - radiology", "MRI Brain - radiology",
      "Ultrasound (US) - radiology")
    assert(wordVoteBest(Seq("ultrasound", "scrotum", "doppler"), options)
      === Some(("Ultrasound (US) - radiology", 1)))
    // no votes anywhere → first option with 0 (python max first-wins)
    assert(wordVoteBest(Seq("zzz"), options) === Some(("CT Scan - radiology", 0)))
    assert(wordVoteBest(Seq("x"), Nil).isEmpty)
  }

  test("fullProcess: non-word to space, lowercase, strip") {
    assert(fullProcess("DAMMAM SCAN CENTER - DAMMAM") === "dammam scan center   dammam")
    assert(fullProcess("  (MedGulf)!  ") === "medgulf")
  }

  test("revision-ratio closed form: marker edits give M = |prev| (or 0) under the REAL matcher") {
    // q_revision_ratio's oracle assumes the matching-block total for the
    // four synthetic edit classes is closed-form. Pin that against the
    // real difflib-parity matcher on adversarial bases — including heavy
    // internal repetition, the case where a stray long internal match
    // could beat the designed prefix/suffix block if the closed form
    // were wrong.
    def halfEven(m: Long, den: Long): Long = {
      val q = 200 * m / den; val r = 200 * m % den
      if (2 * r > den) q + 1 else if (2 * r == den) q + q % 2 else q
    }
    val bases = Seq(
      "scan sort key join",
      "aaa aaa aaa aaa aaa aaa aaa aaa",               // max repetition
      "ab ab ab ab ab ab ab ab ab ab ab ab ab ab ab",  // periodic
      ("scan sort " * 14).trim,                        // 139 chars, near cap
      "q")
    bases.foreach { b =>
      val l = b.length.toLong
      assert(ratio(b, b) === 100)
      assert(ratio(b, b + " ####") === halfEven(l, 2 * l + 5).toInt, s"append on <$b>")
      assert(ratio(b, "#### " + b) === halfEven(l, 2 * l + 5).toInt, s"prepend on <$b>")
      assert(ratio(b, "########") === 0, s"replace on <$b>")
      // second-round edits on already-marked bodies ('@' alphabet)
      val v2 = b + " ####"
      assert(ratio(v2, v2 + " @@@@") === halfEven(v2.length.toLong, 2L * v2.length + 5).toInt)
      assert(ratio(v2, "@@@@ " + v2) === halfEven(v2.length.toLong, 2L * v2.length + 5).toInt)
      val v2r = "########"
      assert(ratio(v2r, v2r + " @@@@") === halfEven(8, 21).toInt)
    }
  }
}
