package graft

import graft.ops.DedupOps

/** Proves the LSH degenerate-bucket cap BINDS: a corpus where one
  * boilerplate text repeats m times puts all m members into the same
  * (band, key) bucket in every band; without a cap that bucket alone
  * emits m·(m-1)/2 candidate pairs. With cap < m the bucket is excluded
  * from pair expansion and only the genuinely-near pair survives, while
  * lshBucketStats still reports the bucket's true size (no silent
  * truncation).
  */
class DedupCapSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = tmpDir("dedup_cap")
    import spark.implicits._
    val boiler = "cookie notice please accept the terms and continue reading"
    val near1 = "alpha beta gamma delta epsilon zeta eta theta"
    val near2 = "alpha beta gamma delta epsilon zeta eta iota" // 1-word diff
    val rows =
      (0L until 20L).map(i => (i, "web", boiler.length.toLong, boiler)) ++
        Seq((100L, "web", near1.length.toLong, near1),
          (101L, "web", near2.length.toLong, near2))
    rows.toDF("doc_id", "source", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("uncapped: degenerate bucket explodes into m(m-1)/2 pairs") {
    val pairs = DedupOps.minhashLsh(spark, dir).collect()
    // 20 identical docs -> 190 pairs, plus (100,101) if their bands collide
    assert(pairs.count(p => p.getLong(0) < 20L && p.getLong(1) < 20L) === 190)
  }

  test("cap < bucket size excludes the degenerate bucket from expansion") {
    val pairs = DedupOps.minhashLsh(spark, dir, cap = 5).collect()
    assert(!pairs.exists(p => p.getLong(0) < 20L && p.getLong(1) < 20L),
      "boilerplate bucket must not emit pairs under the cap")
    // the near-dup pair shares at least one band (7/8 shingles equal) and
    // lives in buckets of size <= 2, far under the cap — it must survive
    assert(pairs.map(p => (p.getLong(0), p.getLong(1))).contains((100L, 101L)))
  }

  test("bucket stats surface the capped population") {
    val r = DedupOps.lshBucketStats(spark, dir).collect().head
    assert(r.getAs[Long]("max_bucket") === 20L)
    // default cap (1000) far above this corpus: nothing capped at default
    assert(r.getAs[Long]("buckets_capped") === 0L)
    assert(r.getAs[Long]("n_buckets") >= 4L)
  }
}
