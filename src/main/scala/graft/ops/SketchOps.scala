package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cardinality sketches for corpus statistics at 100 TB.
  *
  * The estimator here is the salted-minimum sketch (the KMV/HLL family's
  * simplest member): for m independent salts, keep min over the corpus
  * of the md5-fraction of each distinct token; each minimum has
  * E[min] = 1/(n+1), and the MLE over m independent minima is
  * est = m / (f_1 + ... + f_m) - 1 (summing in 1/n space concentrates;
  * averaging in n space would not).
  * Everything is md5-over-strings + double arithmetic in a FIXED
  * expression shape, so DuckDB computes the bit-identical estimate —
  * the oracle is exact, not statistical (same trick as the MinHash
  * signatures in DedupOps).
  *
  * Scale shape: one shuffle on (source) with 2m partial-aggregated min
  * columns — the shuffle carries m doubles per partition per group no
  * matter how many tokens flow in (the same reason HLL sketches are the
  * 100 TB answer to COUNT DISTINCT). The exact count is carried
  * alongside at test scale to show the estimator lands; at 10^12 rows
  * one would drop it.
  */
object SketchOps {

  private val M = 8 // salts
  private val HexDigits = 10 // fraction precision: 40 bits

  /** Per-source distinct-token estimate vs exact. */
  def distinctSketch(spark: SparkSession, dir: String): DataFrame = {
    val tokens = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "explode(array_distinct(split(text, ' '))) as w")
      .distinct() // distinct (source, token): the sketch input
    val fracCols = (1 to M).map { i =>
      // min md5 fraction for salt i: first 10 hex chars as a 16^-10 fraction
      (min(expr(s"conv(substr(md5(cast(concat(w, '#$i') as binary)), 1, $HexDigits), 16, 10)").cast("double")) /
        lit(math.pow(16.0, HexDigits))).as(s"f$i")
    }
    val fracSum = (1 to M).map(i => col(s"f$i")).reduce(_ + _)
    tokens.groupBy(col("source"))
      .agg(countDistinct(col("w")).as("exact_distinct"), fracCols: _*)
      .withColumn("est_distinct",
        round(lit(M.toDouble) / greatest(fracSum, lit(1e-12)) - 1.0, 4))
      .select(col("source"), col("exact_distinct"), col("est_distinct"))
  }

  val distinctSketchSql: String = {
    val mins = (1 to M).map(i =>
      s"min(CAST('0x' || substr(md5(w || '#$i'), 1, $HexDigits) AS BIGINT) / power(16.0, $HexDigits)) AS f$i")
      .mkString(",\n    ")
    val fracSum = (1 to M).map(i => s"f$i").reduce((a, b) => s"($a) + ($b)")
    s"""WITH t AS (SELECT DISTINCT source, unnest(list_distinct(string_split(text, ' '))) AS w
       |  FROM documents),
       |s AS (SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct,
       |    $mins
       |  FROM t GROUP BY source)
       |SELECT source, exact_distinct,
       |  round(8.0 / greatest($fracSum, 1e-12) - 1.0, 4) AS est_distinct
       |FROM s""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_distinct_sketch" -> (distinctSketch(_, _)))

  def oracles: Map[String, String] = Map(
    "q_distinct_sketch" -> distinctSketchSql)
}
