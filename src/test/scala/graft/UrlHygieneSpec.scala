package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.LinkKernel.stripTracking

/** Edge cases for tracking-parameter stripping beyond the generator's
  * five URL shapes, plus bin-capacity invariants for the FFD
  * compaction plan (the oracle pins exact assignments; these pin the
  * properties any assignment must satisfy).
  */
class UrlHygieneSpec extends SparkTestBase {

  test("stripTracking: order preserved, case-insensitive names, valueless params") {
    assert(stripTracking("http://e/p?b=2&utm_source=x&a=1") ===
      (("http://e/p?b=2&a=1", 1)))
    assert(stripTracking("http://e/p?UTM_CAMPAIGN=c&GCLID=g") === (("http://e/p", 2)))
    // valueless tracking param (no '='), valueless real param kept
    assert(stripTracking("http://e/p?fbclid&flag") === (("http://e/p?flag", 1)))
    // empty segments from '&&' vanish without counting as stripped
    assert(stripTracking("http://e/p?a=1&&b=2") === (("http://e/p?a=1&b=2", 0)))
  }

  test("stripTracking: fragments shield their content; no query is a no-op") {
    // '?' AFTER '#' is fragment content, not a query string
    assert(stripTracking("http://e/p#frag?utm_source=x") ===
      (("http://e/p#frag?utm_source=x", 0)))
    assert(stripTracking("http://e/p?utm_a=1&k=v#sec?x") === (("http://e/p?k=v#sec?x", 1)))
    assert(stripTracking("http://e/plain") === (("http://e/plain", 0)))
    // names are matched on the part before '=', not substrings
    assert(stripTracking("http://e/p?myutm_source=keep") ===
      (("http://e/p?myutm_source=keep", 0)))
  }

  test("compactPlan: loads never exceed capacity, bins contiguous, everything packed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("ffd")
    (0L until 64L).map(i => (i, "w"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ops.CorpusOps.compactPlan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 64)
    rows.groupBy(r => (r._1, r._4)).foreach { case ((p, bin), fs) =>
      val load = fs.map(_._3).sum
      // a file larger than the capacity sits ALONE in its bin (real
      // compaction leaves oversized files as-is); a multi-file bin must
      // respect the capacity
      assert(load <= 256L || fs.length == 1,
        s"partition $p bin $bin overflows with ${fs.length} files: $load")
    }
    rows.groupBy(_._1).foreach { case (p, fs) =>
      val bins = fs.map(_._4).toSet
      assert(bins === (1L to bins.max).toSet, s"partition $p bins not contiguous: $bins")
      // FFD sanity: never worse than one bin per file, never better than
      // the volume bound
      val lower = math.ceil(fs.map(_._3).sum / 256.0).toLong
      assert(bins.max >= lower && bins.max <= fs.length)
    }
  }
}
