package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded bucket-membership collector for the banded dedup joins.
  *
  * The scale problem with plain `collect_list`: a degenerate mega-bucket
  * (boilerplate corpus — millions of members under one (band, key))
  * materializes its ENTIRE member list in one aggregation buffer before
  * the size filter can drop it, so the cap bounds pair expansion but not
  * memory. This aggregator carries an exact member COUNT alongside a
  * list capped at `cap + 1` elements: once a bucket is provably over the
  * cap the buffer stops growing (map-side partial aggregation included),
  * so memory per bucket is O(cap) while buckets at or under the cap
  * still yield their complete membership. `n` stays exact for
  * observability (bucket-stats style counting works off the same pass).
  */
object BoundedCollect {

  /** Exact count + members (complete iff n <= cap). */
  case class CollectedIds(n: Long, ids: Seq[Long])
  case class Member(doc_id: Long, fp64: String)
  case class CollectedMembers(n: Long, ms: Seq[Member])

  class IdsAgg(cap: Int) extends Aggregator[Long, (Long, List[Long]), CollectedIds] {
    override def zero: (Long, List[Long]) = (0L, Nil)
    override def reduce(b: (Long, List[Long]), x: Long): (Long, List[Long]) =
      (b._1 + 1, if (b._2.lengthCompare(cap + 1) < 0) x :: b._2 else b._2)
    override def merge(a: (Long, List[Long]), b: (Long, List[Long])): (Long, List[Long]) =
      (a._1 + b._1, (a._2 ::: b._2).take(cap + 1))
    override def finish(r: (Long, List[Long])): CollectedIds = CollectedIds(r._1, r._2)
    override def bufferEncoder: Encoder[(Long, List[Long])] =
      ExpressionEncoder[(Long, List[Long])]()
    override def outputEncoder: Encoder[CollectedIds] =
      ExpressionEncoder[CollectedIds]()
  }

  class MembersAgg(cap: Int) extends Aggregator[Member, (Long, List[Member]), CollectedMembers] {
    override def zero: (Long, List[Member]) = (0L, Nil)
    override def reduce(b: (Long, List[Member]), x: Member): (Long, List[Member]) =
      (b._1 + 1, if (b._2.lengthCompare(cap + 1) < 0) x :: b._2 else b._2)
    override def merge(a: (Long, List[Member]), b: (Long, List[Member])): (Long, List[Member]) =
      (a._1 + b._1, (a._2 ::: b._2).take(cap + 1))
    override def finish(r: (Long, List[Member])): CollectedMembers = CollectedMembers(r._1, r._2)
    override def bufferEncoder: Encoder[(Long, List[Member])] =
      ExpressionEncoder[(Long, List[Member])]()
    override def outputEncoder: Encoder[CollectedMembers] =
      ExpressionEncoder[CollectedMembers]()
  }

  /** `ids(cap)(idCol)` → struct<n, ids> with ids capped at cap+1. */
  def ids(cap: Int): Column => Column = {
    val fn = udaf(new IdsAgg(cap))
    c => fn(c)
  }

  /** `members(cap)(docIdCol, fpCol)` — one column per Member field. */
  def members(cap: Int): (Column, Column) => Column = {
    val fn = udaf(new MembersAgg(cap), ExpressionEncoder[Member]())
    (id, fp) => fn(id, fp)
  }
}
