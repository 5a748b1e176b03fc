package graft

import org.apache.spark.sql.functions._

/** Shard-packing and host-dedup contracts on hand-built corpora: the
  * two-phase prefix sum must equal the naive global scan, and the
  * host-scoped dedup must cut same-host chrome while keeping identical
  * text on different hosts.
  */
class PackingSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(docs: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("packing")
    docs
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tokenShards two-phase prefix equals the naive global scan") {
    // doc_ids straddle several 100-wide prefix buckets; word counts are
    // irregular so shard boundaries land mid-bucket.
    val docs = Seq(5L, 17L, 99L, 100L, 101L, 250L, 399L, 400L, 777L).zipWithIndex.map {
      case (id, k) => (id, (1 to (300 + 137 * k % 700)).map(i => s"w$i").mkString(" "), "srcA")
    }
    val dir = corpus(docs)
    val out = ops.SampleOps.tokenShards(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive reference: exclusive running sum in doc_id order / 1000
    var run = 0L
    val expected = docs.sortBy(_._1).map { case (id, text, _) =>
      val n = text.split(' ').length.toLong
      val shard = run / 1000L
      run += n
      (id, n, shard)
    }
    assert(out.toSeq === expected)
    // shard ids must be non-decreasing in doc order
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }

  test("hostLineDedup cuts same-host chrome, keeps cross-host repeats") {
    val chrome = "nav home about contact privacy terms login search" // 8 words
    val dir = corpus(Seq(
      (0L, s"$chrome a1 a2 a3 a4 a5 a6 a7 a8", "hostA"),
      (1L, s"$chrome b1 b2 b3 b4 b5 b6 b7 b8", "hostA"),
      (2L, s"$chrome c1 c2 c3 c4 c5 c6 c7 c8", "hostB")))
    val out = ops.CorpusOps.hostLineDedup(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    // hostA: chrome segment shared by docs 0 and 1 -> dropped from both
    assert(out(0) === ((0L, "a1 a2 a3 a4 a5 a6 a7 a8", 1L)))
    assert(out(1) === ((1L, "b1 b2 b3 b4 b5 b6 b7 b8", 1L)))
    // hostB: same chrome text, but unique within its host -> kept intact
    assert(out(2) === ((2L, s"$chrome c1 c2 c3 c4 c5 c6 c7 c8", 0L)))
  }
}
