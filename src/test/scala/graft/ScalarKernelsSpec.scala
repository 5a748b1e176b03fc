package graft

import graft.kernels.ScalarKernels._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the §2.8 exact-port kernels, with inputs lifted from the
  * reference fixture corpus (outputs/az_results_1.md) so the semantics are
  * pinned to real observed OCR lines, not synthetic approximations.
  */
class ScalarKernelsSpec extends AnyFunSuite {

  test("cleanOcrText: bracket branch strips quotes, commas become spaces, brackets kept") {
    // az_results_1.md:35
    assert(cleanOcrLine("['Single', '(', ')', 'Married', '(', ')', 'Plan', 'Type', 'EHCPOL']") ===
      "[Single  (  )  Married  (  )  Plan  Type  EHCPOL]")
    assert(cleanOcrLine("['Authorization', ':', '250226-27344720']") ===
      "[Authorization  :  250226-27344720]") // hyphens and colons preserved
  }

  test("cleanOcrText: non-bracket branch drops quotes, commas become spaces") {
    assert(cleanOcrLine("Provider Name: Doha, 'X'") === "Provider Name: Doha  X")
    assert(cleanOcrLine("[partial bracket, no close") === "[partial bracket  no close")
    assert(cleanOcrLine("") === "")
    assert(cleanOcrLine("[]") === "[]")
  }

  test("cleanOcrText: line structure preserved across \\n") {
    assert(cleanOcrText("['a', 'b']\nc, d") === "[a  b]\nc  d")
  }

  test("processCheckboxes: paren checkboxes with 3-token lookbehind (az_results_1.md:35,41)") {
    assert(processCheckboxLine("Single ( ) Married ( ) Plan Type EHCPOL") ===
      "Single false Married false Plan Type EHCPOL")
    assert(processCheckboxLine("Inpatient ( ) Outpatient (v)") ===
      "Inpatient false Outpatient true")
    // no checkbox field in the 3 preceding tokens -> parens kept, but the
    // reference still strips the inner content (checkbox_replacement
    // returns f"({content})" with content.strip(), convert_to_json.py:66-83)
    assert(processCheckboxLine("Emergency Care Level: 1 ( ) 2 ( )") ===
      "Emergency Care Level: 1 () 2 ()")
    // multi-char content kept even after a checkbox field
    assert(processCheckboxLine("married (ab)") === "married (ab)")
  }

  test("processCheckboxes: Yes/No rewrite is first-match-wins with early return") {
    assert(processCheckboxLine("refill: Yes extra") === "refill: true extra")
    assert(processCheckboxLine("refill No") === "refill: false")
    // 'single' precedes 'married' in the field list -> married Yes/No untouched
    assert(processCheckboxLine("single Yes married No") === "single: true married No")
    // 'Referral' is NOT a checkbox field (az_results_1.md:37) -> unchanged
    assert(processCheckboxLine("Referral: Yes Referral PreAuth Provider: DAMMAM") ===
      "Referral: Yes Referral PreAuth Provider: DAMMAM")
  }

  test("rejoinFragments: reference 9-suffix ladder in order") {
    assert(rejoinFragments("mammo gram") === "mammogram")
    assert(rejoinFragments("dialy sis") === "dialysis")
    assert(rejoinFragments("radiogra phy") === "radiography")
    assert(rejoinFragments("consulta tion and imag ing") === "consultation and imaging")
    assert(rejoinFragments("proced um follow ed") === "procedum followed")
    // untouched when the tail is not a listed suffix
    assert(rejoinFragments("CT scan of head") === "CT scan of head")
  }

  test("extractKeyWords: camelCase split, Al prefix, generic drop (python-verified)") {
    assert(extractKeyWords(
      "The Mediterranean and Gulf Cooperative Insurance and Reinsurance Company (MedGulf)") ===
      "Mediterranean Gulf Med Gulf")
    assert(extractKeyWords("AlRajhi Takaful") === "Al Rajhi Takaful")
    assert(extractKeyWords("BUPA Arabia") === "BUPA Arabia") // all-caps run kept
    assert(extractKeyWords("alinma") === "Al inma")
    assert(extractKeyWords("Al") === "Al")
    assert(extractKeyWords("") === "")
  }

  test("orderedChunks: 2,3,1 priority with paren-derived chunks first (python-verified)") {
    assert(orderedChunks(
      "The Mediterranean and Gulf Cooperative Insurance and Reinsurance Company (MedGulf)", 2) ===
      List("Med Gulf", "Mediterranean Gulf", "Gulf Med", "Gulf", "Med", "Gulf", "Mediterranean"))
    assert(orderedChunks("Tawuniya National Care", 3) ===
      List("Tawuniya National", "National Care", "Tawuniya National Care",
        "Tawuniya", "National", "Care"))
  }

  test("findPayerInfo: payer tails + boilerplate lines joined with spaces") {
    val lines = IndexedSeq(
      "Payer: MedGulf TPA",
      "irrelevant line",
      "Please note that prior approval is required",
      // guard wants literal 'payer:' — a spaced colon misses it even
      // though the split regex would tolerate it (reference quirk)
      "PAYER : skipped")
    assert(findPayerInfo(lines) ===
      "MedGulf TPA Please note that prior approval is required")
    assert(findPayerInfo(IndexedSeq("nothing here")) === "")
  }

  test("cleanServiceDescription: cut at earliest marker, collapse whitespace") {
    assert(cleanServiceDescription("MRI brain   scan Signature John") === "MRI brain scan")
    assert(cleanServiceDescription("X-ray chest Req. Qty 2") === "X-ray chest")
    assert(cleanServiceDescription("simple  desc ") === "simple desc")
    // earliest of several markers wins ('Date' before 'Signature')
    assert(cleanServiceDescription("ultrasound Date 2025 Signature X") === "ultrasound")
  }
  test("cleanToken: python-verified vectors (convert_to_json.py:145-154)") {
    import graft.kernels.ScalarKernels.cleanToken
    assert(cleanToken("  ['Code', 'Service']  ") === "code service")
    assert(cleanToken("[[Nested]]") === "nested")
    assert(cleanToken("{Braced}") === "braced")
    assert(cleanToken("A,B ,C") === "a b c")
    assert(cleanToken("Plain  TEXT") === "plain text")
    assert(cleanToken("['x']") === "x")
    assert(cleanToken("{[mix]}") === "[mix]") // brace pair strips once only
    assert(cleanToken("") === "")
  }

  test("findKeyRecursive: dict-order DFS, case-insensitive, depth-capped") {
    import graft.kernels.ScalarKernels.findKeyRecursive
    assert(findKeyRecursive("""{"a":{"b":{"Payer":"acme"}},"c":1}""", Seq("payer"))
      === Some("acme"))
    assert(findKeyRecursive("""{"list":[{"x":1},{"payer":"zeta"}]}""", Seq("payer"))
      === Some("zeta"))
    assert(findKeyRecursive("""{"a":2}""", Seq("payer")) === None)
    // dict order: key match at the CURRENT level beats a deeper one seen later
    assert(findKeyRecursive("""{"w":{"payer":"deep"},"payer":"top"}""", Seq("payer"))
      === Some("deep")) // w comes first and recursion into it wins (python parity)
    // container value stringifies as JSON
    assert(findKeyRecursive("""{"payer":{"id":7}}""", Seq("payer"))
      === Some("""{"id":7}"""))
    // depth cap
    val deep = ("{\"k\":" * 12) + "{\"payer\":\"x\"}" + ("}" * 12)
    assert(findKeyRecursive(deep, Seq("payer"), maxDepth = 10) === None)
    assert(findKeyRecursive("not json", Seq("payer")) === None)
  }
}
