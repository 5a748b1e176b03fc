package graft

import graft.kernels.KllKernel
import graft.kernels.KllKernel.{C, Sketch}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property + adversarial-fixture coverage for the deterministic KLL
  * sketch: weight preservation, the one-sided rank bound (the theorem
  * `q_kll_quantiles` gates), merge bound additivity, permutation
  * invariance (pure function of the multiset — what makes the SQL
  * replay sound), and exactness below capacity.
  */
class KllKernelSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: $res")
  }

  private def rankBoundHolds(values: Seq[Long], s: Sketch): Boolean = {
    val n = values.length.toLong
    if (n == 0) return true
    val sorted = values.sorted
    (1 to 99 by 7).forall { q =>
      val r = (q * n + 99) / 100
      val e = KllKernel.estimate(s, r)
      val le = sorted.count(_ <= e).toLong
      val lt = sorted.count(_ < e).toLong
      le >= r - s.bound && lt <= r - 1
    }
  }

  test("n <= capacity: no compaction, bound 0, estimates exact") {
    val vs = Seq(5L, 1L, 9L, 3L, 3L, 7L)
    val s = KllKernel.build(vs)
    assert(s.bound === 0L)
    assert(s.totalWeight === vs.length.toLong)
    val sorted = vs.sorted
    (1 to vs.length).foreach { r =>
      assert(KllKernel.estimate(s, r.toLong) === sorted(r - 1), s"rank $r")
    }
  }

  test("weight preservation through deep cascades and merges") {
    val vs = (0 until 5000).map(i => (i * 2654435761L) % 997)
    val s = KllKernel.build(vs)
    assert(s.totalWeight === 5000L)
    val (a, b) = vs.splitAt(1234)
    val m = KllKernel.merge(KllKernel.build(a), KllKernel.build(b))
    assert(m.totalWeight === 5000L)
  }

  test("merge bound is additive: halves + merge-cascade compactions") {
    val vs = (0 until 2000).map(i => (i * 48271L) % 577)
    val (a, b) = vs.partition(_ % 2 == 0)
    val sa = KllKernel.build(a)
    val sb = KllKernel.build(b)
    val m = KllKernel.merge(sa, sb)
    assert(m.bound >= sa.bound + sb.bound)
    assert(rankBoundHolds(vs, m))
  }

  test("all-equal values: estimate is that value at every rank") {
    val s = KllKernel.build(Vector.fill(1000)(42L))
    (1L to 1000L by 111L).foreach(r => assert(KllKernel.estimate(s, r) === 42L))
    assert(rankBoundHolds(Vector.fill(1000)(42L), s))
  }

  test("single-pass bound ≤ 2n/c") {
    Seq(100, 1000, 5000, 33).foreach { n =>
      val s = KllKernel.build((0 until n).map(_.toLong))
      assert(s.bound <= 2L * n / C, s"n=$n bound=${s.bound}")
    }
  }

  test("property: rank bound holds for random multisets (single and merged)") {
    val gen = for {
      n <- Gen.choose(0, 3000)
      vs <- Gen.listOfN(n, Gen.choose(0L, 500L))
    } yield vs
    check("single-pass bound", Prop.forAll(gen) { vs =>
      rankBoundHolds(vs, KllKernel.build(vs))
    }, n = 100)
    check("merged bound", Prop.forAll(gen) { vs =>
      val (a, b) = vs.zipWithIndex.partition(_._2 % 2 == 0)
      val m = KllKernel.merge(KllKernel.build(a.map(_._1)), KllKernel.build(b.map(_._1)))
      rankBoundHolds(vs, m) && m.totalWeight == vs.length.toLong
    }, n = 100)
  }

  test("property: construction is a pure function of the multiset") {
    val gen = for {
      n <- Gen.choose(1, 800)
      vs <- Gen.listOfN(n, Gen.choose(0L, 99L))
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (vs, seed)
    check("permutation invariance", Prop.forAll(gen) { case (vs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(vs)
      val s1 = KllKernel.build(vs)
      val s2 = KllKernel.build(shuffled)
      // sketches must be identical as level-multisets
      s1.bound == s2.bound &&
        s1.levels.view.mapValues(_.sorted).toMap == s2.levels.view.mapValues(_.sorted).toMap
    }, n = 100)
  }
}
