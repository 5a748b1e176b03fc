package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the data-layout / mixing / community operators
  * (the oracle gate covers the generated tables; these pin the CLAIMS:
  * Z-order files prune better than insertion order on the non-leading
  * dimension, temperature quotas are exact and compress the skew, and
  * LPA separates cliques that connected components would merge).
  */
class LayoutMixSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(docs: Seq[(Long, String)]): String = {
    val dir = tmpDir("layoutmix")
    docs
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("zorderLayout: z-files prune host predicates that insertion order cannot") {
    // 800 docs: host = id % 50 cycles through every insertion slice, so
    // every insertion file spans (almost) the full host range while each
    // z-file covers a host rectangle.
    val dir = corpus((0L until 800L).map(i => i -> "w"))
    val out = ops.RelationalOps.zorderLayout(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(7)))
    val (zf, lf) = out.partition(_._1 == "zorder")
    assert(zf.map(_._3).sum === 800L)
    assert(lf.map(_._3).sum === 800L)
    val zTouched = zf.count(_._6)
    val lTouched = lf.count(_._6)
    assert(zTouched < lTouched,
      s"z-order should touch fewer files for host=7 ($zTouched vs $lTouched)")
    // every insertion file sees (nearly) all hosts; z-files are rectangles
    val zMaxSpan = zf.map(f => f._5 - f._4).max
    val lMinSpan = lf.map(f => f._5 - f._4).min
    assert(zMaxSpan < lMinSpan,
      s"z-file host ranges ($zMaxSpan) must be tighter than insertion ranges ($lMinSpan)")
  }

  test("mixTemperature: quotas sum to the budget and compress the skew") {
    // two components via length bands: 10 short docs (band 0) vs 40
    // longer docs (band 1) — natural ratio 1:4, sqrt-tempered ratio 1:2.
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val long = (1 to 50).map(i => s"l$i").mkString(" ")
    val dir = corpus(
      (0L until 10L).map(i => i -> short) ++
        (10L until 50L).map(i => i -> long))
    val rows = ops.SampleOps.mixTemperature(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._3).sum === 1000L)
    val Array(small, big) = rows
    assert(small._2 === 10L && big._2 === 40L)
    // tempering: quota share of the small component strictly exceeds its
    // natural share (200 of 1000), and monotonicity holds
    assert(small._3 > 200L && small._3 < big._3,
      s"expected 200 < small quota < big quota, got $rows")
    // exact Hamilton apportionment of w = (3162, 6324): bases (333, 666),
    // the one leftover seat goes to the larger remainder (6324 > 3162)
    assert(small._3 === 333L && big._3 === 667L)
  }

  test("lpaRounds: two cliques bridged by a weak edge stay separate communities") {
    // connected components would merge everything; LPA keeps the cliques
    // apart because intra-clique weight dominates the bridge.
    val intra = Seq(
      ("a", "b", 10L), ("b", "c", 10L), ("a", "c", 10L),
      ("x", "y", 10L), ("y", "z", 10L), ("x", "z", 10L))
    val bridge = Seq(("c", "x", 1L))
    val und = (intra ++ bridge)
      .flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
      .toDF("node", "nbr", "w")
    val labels = ops.LinkOps.lpaRounds(und, 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set("a", "b", "c").map(labels) === Set("a"))
    assert(Set("x", "y", "z").map(labels) === Set("x"))
  }
}
