package graft

import org.apache.spark.sql.functions._

/** Quality-gate semantics on hand-built micro-corpora (the oracle gate
  * covers the generated tables; these pin the contracts: donor docs are
  * always flagged, disjoint docs stay clean, the perplexity ordering
  * separates in-model from out-of-model text, and the span cut removes
  * exactly the covered positions).
  */
class QualityOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(docs: Seq[(Long, String)]): String = {
    val dir = tmpDir("quality")
    docs
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def ws(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("decontaminate flags the eval donor and any doc sharing an 8-gram") {
    // doc 0 (0 % 41 == 0) donates its first 24 words to the eval set;
    // doc 7 copies 8 of those words verbatim; doc 9 is disjoint.
    val donor = ws(24, "e")
    val dir = corpus(Seq(
      0L -> (donor + " " + ws(10, "x")),
      7L -> ("lead in " + (9 to 16).map(i => s"e$i").mkString(" ") + " out"),
      9L -> ws(30, "z")))
    val out = ops.QualityOps.decontaminate(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out(0)._3 === "contaminated") // donor always hits itself
    assert(out(0)._2 >= 17L)             // every eval shingle present
    assert(out(1) === ((7L, 1L, "contaminated")))
    assert(out(2) === ((9L, 0L, "clean")))
  }

  test("lmPerplexity scores in-model text lower than out-of-model text") {
    // Training sample = doc_id % 5 == 0. Docs 0,5,10 repeat one bigram
    // pattern; doc 3 (scored, not sampled) repeats the same pattern and
    // must land at a LOWER mean NLL than doc 4's never-seen vocabulary.
    val seen = Array.fill(20)("alpha beta").mkString(" ")
    val dir = corpus(Seq(
      0L -> seen, 5L -> seen, 10L -> seen,
      3L -> seen,
      4L -> ws(40, "nov"),
      // held-out cutoff donors (doc_id % 7 == 3, % 5 != 0)
      17L -> seen, 24L -> ws(40, "mid"), 31L -> ws(40, "nov")))
    val out = ops.QualityOps.lmPerplexity(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3)))
      .toMap
    assert(out(3L)._1 < out(4L)._1)
    assert(out(3L)._2 === "head")
    val buckets = out.values.map(_._2).toSet
    assert(buckets.subsetOf(Set("head", "middle", "tail")))
  }

  test("exactSubstrCut removes exactly the covered positions") {
    // docs 0 and 1 share one 8-word run in the middle; doc 2 is unique.
    val shared = ws(8, "s")
    val dir = corpus(Seq(
      0L -> (ws(3, "a") + " " + shared + " " + ws(3, "b")),
      1L -> (ws(4, "c") + " " + shared + " " + ws(2, "d")),
      2L -> ws(20, "u")))
    val out = ops.CorpusOps.exactSubstrCut(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((0L, ws(3, "a") + " " + ws(3, "b"), 8L)))
    assert(out(1) === ((1L, ws(4, "c") + " " + ws(2, "d"), 8L)))
    assert(out(2) === ((2L, ws(20, "u"), 0L)))
  }

  test("exactSubstrCut word-count invariant holds on overlapping spans") {
    // overlapping duplicated shingles: docs share a 12-word run, so the
    // 5 overlapping 8-gram starts cover 12 positions, not 5*8.
    val run = ws(12, "r")
    val dir = corpus(Seq(
      0L -> (run + " " + ws(6, "p")),
      1L -> (ws(2, "q") + " " + run)))
    val out = ops.CorpusOps.exactSubstrCut(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(out(0) === ((ws(6, "p"), 12L)))
    assert(out(1) === ((ws(2, "q"), 12L)))
  }

  test("substrDedup50 cuts self-repeats and shared-block interiors, keeps seams") {
    val dir = corpus(Seq(
      0L -> ws(20, "b"), // 0 % 7 == 0: shared 60-token block appended
      7L -> ws(30, "c"), // 7 % 7 == 0: shared block appended
      3L -> ws(60, "a"), // 3 % 11 == 3, >= 55 words: self-repeat appended
      2L -> ws(80, "d"))) // control: nothing planted, no repeats
    val out = ops.CorpusOps.substrDedup50(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // cross-doc block: all 60 interior positions cut, the unique base
    // (and with it the seam) survives in both docs
    assert(out(0L) === ((ws(20, "b"), 60L)))
    assert(out(7L) === ((ws(30, "c"), 60L)))
    // self-repeat: first 55 words occur twice (doc start + appended
    // copy) -> both copies cut under the any-two-occurrences rule; the
    // 5-word tail between them is the only survivor
    assert(out(3L) === (((56 to 60).map(i => s"a$i").mkString(" "), 110L)))
    assert(out(2L) === ((ws(80, "d"), 0L)))
    // the 8-gram op's cross-DOCUMENT rule sees nothing to cut in the
    // self-repeat doc — the semantic line between the two operators
    val eight = ops.CorpusOps.exactSubstrCut(spark, dir)
      .where("doc_id = 3").collect()
    assert(eight.head.getLong(2) === 0L)
  }

  test("exactSubstrCut stays linear on a long fully-duplicated document") {
    // the exact doc this operator exists for: two identical 20k-word
    // docs cover EVERY position, so the covered set is as large as the
    // doc. The per-position rewrite must be hash-set subtraction
    // (ArrayExcept), not an array_contains scan — the quadratic variant
    // (20k x 160k comparisons per doc) stalls for minutes here.
    val long = ws(20000, "dup")
    val dir = corpus(Seq(0L -> long, 1L -> long))
    val t0 = System.nanoTime()
    val out = ops.CorpusOps.exactSubstrCut(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.toSeq === Seq(("", 20000L), ("", 20000L)))
    assert(secs < 60.0, f"exactSubstrCut took $secs%.1f s on a fully-duplicated 20k-word doc — quadratic rewrite regression")
  }

  test("robustOutliers flags extremes that a mean-sigma rule would mask") {
    // 8 normal 100-word docs + TWO 5000-word monsters in one source:
    // the monsters inflate mean (~1080) and sigma (~1960) so much that
    // mean+3*sigma (~6960) flags NEITHER — the classic masking failure.
    // Median (100) and MAD (0... use slight spread: lengths 98..105)
    val dir = corpus(
      (0L until 8L).map(i => i -> ws(98 + i.toInt, "n")) ++
        Seq(8L -> ws(5000, "m"), 9L -> ws(5000, "m")))
    val rows = ops.QualityOps.robustOutliers(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    // lower median of (98..105, 5000, 5000) = 102 (5th of 10); MAD:
    // devs (4,3,2,1,0,1,2,3,4898,4898) sorted -> lower median 2
    assert(rows(4L)._2 === 102L && rows(4L)._3 === 2L)
    assert(rows(8L)._4 && rows(9L)._4, "both monsters must be flagged")
    // sanity: the mean-sigma rule would NOT flag them (documents why
    // the operator is median/MAD): mean + 3*sigma > 5000 here
    val lens = (98 to 105).map(_.toDouble) ++ Seq(5000.0, 5000.0)
    val mean = lens.sum / lens.size
    val sigma = math.sqrt(lens.map(x => (x - mean) * (x - mean)).sum / lens.size)
    assert(mean + 3 * sigma > 5000.0)
    assert((0L until 8L).forall(i => !rows(i)._4), "normal docs stay clean")
  }
}
