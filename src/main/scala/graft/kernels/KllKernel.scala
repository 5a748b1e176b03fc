package graft.kernels

/** Deterministic KLL-style mergeable quantile sketch (Karnin, Lang &
  * Liberty 2016, "Optimal quantile approximation in streams", FOCS —
  * the level-compactor structure, §2) with the randomized coin replaced
  * by a FIXED keep-odd-ranks rule so construction is a pure function of
  * the input multiset and an unrolled SQL CTE can replay it exactly.
  *
  * Structure: level h holds items of weight 2^h, capacity `c` per
  * level. BULK cascade (levels ascending): a level over capacity
  * compacts ONCE — sort ascending, the odd leftover (the max, when the
  * count is odd) stays, the 1st/3rd/5th/… of the even prefix promote to
  * level h+1 with doubled weight, the rest drop. One pass per level
  * suffices because a compaction leaves ≤ 1 item behind. Merge =
  * level-wise concatenation + the same cascade.
  *
  * PROVABLE RANK BOUND (one-sided): a compaction at level h changes the
  * below-count estimate of any value by +{0, 2^h} (survivors below a
  * query point number ceil(r/2) of r, at doubled weight), so for every
  * value v:  true(<v) ≤ W(<v) ≤ true(<v) + B,  where W is the sketch's
  * weighted below-count and B = Σ 2^h over performed compactions —
  * tracked exactly, reported per path, and ≤ 2n/c for a single-pass
  * build (ε ≈ 2/c, the tunable-error knob; the randomized original gets
  * √ factors better — determinism trades constants for replayability).
  * Consequently the returned quantile value e (smallest sketch value
  * with cumulative weight ≥ r) satisfies  true(≤e) ≥ r − B  and
  * true(<e) ≤ r − 1  — the invariant `q_kll_quantiles` gates on both
  * the merged-halves and single-pass paths. Total weight is preserved
  * by every compaction, so both paths carry exactly n — the merge
  * invariant that IS identical (the estimates themselves may differ
  * between paths by design; both stay inside the bound).
  */
object KllKernel {

  /** Per-level capacity (the ε ≈ 2/c knob). */
  val C = 32

  /** Fixed cascade depth: covers n ≤ C·2^LMax items; steps past the
    * data are identity. The SQL replay unrolls exactly this many.
    */
  val LMax = 16

  /** levels(h) = items of weight 2^h (unsorted between ops);
    * bound = Σ 2^h over every compaction performed building this state.
    */
  final case class Sketch(levels: Map[Int, Vector[Long]], bound: Long) {
    def totalWeight: Long =
      levels.iterator.map { case (h, vs) => vs.length.toLong << h }.sum
  }

  /** One bulk cascade pass, levels ascending — mirrors the oracle's
    * unrolled steps exactly (one potential compaction per level).
    */
  def cascade(levels0: Map[Int, Vector[Long]], priorBound: Long = 0L): Sketch = {
    val levels = scala.collection.mutable.Map.from(levels0)
    var bound = priorBound
    var k = 0
    while (k < LMax) {
      val cur = levels.getOrElse(k, Vector.empty)
      if (cur.length > C) {
        val s = cur.sorted
        val m = s.length
        val e = m - (m % 2)
        val promoted = (0 until e by 2).map(s) // 0-based even = 1-based odd ranks
        levels(k) = s.drop(e) // ≤ 1 leftover (the max)
        levels(k + 1) = levels.getOrElse(k + 1, Vector.empty) ++ promoted
        bound += 1L << k
      }
      k += 1
    }
    require(levels.getOrElse(LMax, Vector.empty).length <= C,
      s"input exceeds the fixed cascade depth (n > C·2^LMax)")
    Sketch(levels.toMap.filter(_._2.nonEmpty), bound)
  }

  /** Single-pass bulk build from raw values. */
  def build(values: IterableOnce[Long]): Sketch =
    cascade(Map(0 -> values.iterator.toVector))

  /** Mergeable-summary merge: concatenate level-wise, re-cascade;
    * bounds add (each path's compactions all contribute).
    */
  def merge(a: Sketch, b: Sketch): Sketch = {
    val keys = a.levels.keySet ++ b.levels.keySet
    val cat = keys.iterator.map { k =>
      k -> (a.levels.getOrElse(k, Vector.empty) ++ b.levels.getOrElse(k, Vector.empty))
    }.toMap
    cascade(cat, a.bound + b.bound)
  }

  /** (value, total weight) ascending by value. */
  def weightTable(s: Sketch): Seq[(Long, Long)] =
    s.levels.iterator
      .flatMap { case (h, vs) => vs.iterator.map(v => (v, 1L << h)) }
      .toSeq.groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq.sortBy(_._1)

  /** Smallest sketch value whose cumulative weight reaches rank r. */
  def estimate(s: Sketch, r: Long): Long = {
    val wt = weightTable(s)
    var cum = 0L
    val it = wt.iterator
    while (it.hasNext) {
      val (v, w) = it.next()
      cum += w
      if (cum >= r) return v
    }
    wt.last._1
  }

  /** Flatten for Dataset transport: (level, value) pairs. */
  def toPairs(s: Sketch): Seq[(Int, Long)] =
    s.levels.iterator.flatMap { case (h, vs) => vs.iterator.map(h -> _) }.toSeq

  def fromPairs(pairs: Seq[(Int, Long)], bound: Long): Sketch =
    Sketch(pairs.groupMap(_._1)(_._2).view.mapValues(_.toVector).toMap, bound)
}
