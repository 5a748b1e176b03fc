package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-smallest-by-hash aggregate — the deterministic analog of a
  * per-group reservoir sample.
  *
  * A fixed-size uniform sample per group is usually written as
  * `row_number() OVER (PARTITION BY g ORDER BY hash)` + `rn <= k`, which
  * shuffles EVERY row of the group into one reducer before the filter —
  * the same scale bug the ANN path had with top-k windows (see
  * [[graft.functions.TopK]]). This typed [[Aggregator]] plans as a
  * two-phase aggregate: each partition's partial buffer is capped at k
  * candidates, so the exchange carries O(k · partitions · groups) rows,
  * never O(corpus). At 10^12 documents a 10-per-domain sample ships tens
  * of rows per partition per domain instead of the domain's full extent.
  *
  * Ordering is the total order (hash ASC, id ASC) over the FULL hash
  * string (lowercase hex compares identically to the digest bytes), so
  * the result is deterministic under any merge arrival order and exactly
  * reproducible by an ORDER BY in the oracle engine.
  */
object MinK {

  /** One candidate: the sampling hash and the row id it selects. */
  case class HCand(h: String, id: Long)

  class MinKAgg(k: Int) extends Aggregator[HCand, List[HCand], Seq[HCand]] {
    private def before(a: HCand, b: HCand): Boolean = {
      val c = a.h.compareTo(b.h)
      c < 0 || (c == 0 && a.id < b.id)
    }

    override def zero: List[HCand] = Nil

    // buffer kept sorted ascending and never exceeds k elements
    override def reduce(buf: List[HCand], c: HCand): List[HCand] =
      if (buf.lengthCompare(k) >= 0 && !before(c, buf.last)) buf
      else {
        val (pre, post) = buf.span(x => before(x, c))
        val merged = pre ::: c :: post
        if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }

    override def merge(a: List[HCand], b: List[HCand]): List[HCand] =
      b.foldLeft(a)(reduce)

    override def finish(r: List[HCand]): Seq[HCand] = r

    override def bufferEncoder: Encoder[List[HCand]] =
      ExpressionEncoder[List[HCand]]()
    override def outputEncoder: Encoder[Seq[HCand]] =
      ExpressionEncoder[Seq[HCand]]()
  }

  /** `mink(k)(hashCol, idCol)`: array<struct<h,id>> of the k smallest,
    * ascending — element i is the rank-(i+1) sample member.
    */
  def mink(k: Int): (Column, Column) => Column = {
    val fn = udaf(new MinKAgg(k))
    (h, id) => fn(h, id)
  }
}
