package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate for similarity search.
  *
  * The scale problem with `row_number() OVER (PARTITION BY q_id)`: every
  * corpus row scored for a query is shuffled into ONE reducer before the
  * `rn <= k` filter — at 10^12 rows that reducer receives the whole
  * corpus. A typed [[Aggregator]] gets planned as a proper two-phase
  * aggregate: the partial buffer is capped at k candidates, so the
  * map-side combine reduces each partition's contribution to AT MOST k
  * rows per query before the exchange; the shuffle carries
  * O(k · partitions · queries) rows, never O(corpus).
  *
  * Candidate order is the total order (sim DESC, n_id ASC), which makes
  * the result deterministic under any reduce/merge arrival order —
  * including the cap boundary, where equal-sim candidates keep the
  * smaller id.
  */
object TopK {

  /** One scored candidate. */
  case class Cand(n_id: Long, sim: Double)

  class TopKAgg(k: Int) extends Aggregator[Cand, List[Cand], Seq[Cand]] {
    private def wins(a: Cand, b: Cand): Boolean =
      a.sim > b.sim || (a.sim == b.sim && a.n_id < b.n_id)

    override def zero: List[Cand] = Nil

    // buffer is kept sorted by `wins` and never exceeds k elements
    override def reduce(buf: List[Cand], c: Cand): List[Cand] =
      if (buf.lengthCompare(k) >= 0 && !wins(c, buf.last)) buf
      else {
        val (pre, post) = buf.span(x => wins(x, c))
        val merged = pre ::: c :: post
        if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }

    override def merge(a: List[Cand], b: List[Cand]): List[Cand] =
      b.foldLeft(a)(reduce)

    override def finish(r: List[Cand]): Seq[Cand] = r

    override def bufferEncoder: Encoder[List[Cand]] =
      ExpressionEncoder[List[Cand]]()
    override def outputEncoder: Encoder[Seq[Cand]] =
      ExpressionEncoder[Seq[Cand]]()
  }

  /** `topk(k)(idCol, simCol)`: array<struct<n_id,sim>> of the k best. */
  def topk(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k))
    (id, sim) => fn(id, sim)
  }
}
