package graft

import graft.gen.PagesGen
import graft.model.PageRow
import graft.ops._
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family registers (query, DuckDB-oracle) pairs:
  *  - ExtractionOps: the real HTML/PDF kernel end-to-end (round-trip
  *    oracle: extract(wrap(text)) == text, byte-identical)
  *  - RelationalOps: pipeline-stage analogs over TPC-H-ish tables
  *  - TextOps / DedupOps / SimilarityOps / MultimodalOps: training-data
  *    pipeline operators over documents/embeddings
  */
object SparkEntry {

  /** Flagship: full extraction pipeline (chrome-wrapped synthetic corpus,
    * HTML + multi-page PDF + passthrough mix, url-hash repartition) on
    * sf0.001-sized input; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val corpus = PagesGen.corpus(2000, seed = 42L)
    val pages = corpus.map(_.row).toDS()
    ExtractPipeline
      .extract(spark, pages.toDF(), ExtractPipeline.Conf(repartition = 32))
      .toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExtractionOps.queries ++ RelationalOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      ScalarOps.queries ++ FormOps.queries ++ AggOps.queries ++ SketchOps.queries ++
      SampleOps.queries ++ LinkOps.queries ++ RankOps.queries ++
      CorpusOps.queries ++ QualityOps.queries ++ ArticleOps.queries ++
      graft.streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Column names + types match the Spark side
    * (the driver's compare sorts columns by name and hashes values).
    */
  def oracleSql: Map[String, String] =
    ExtractionOps.oracles ++ RelationalOps.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ MultimodalOps.oracles ++
      ScalarOps.oracles ++ FormOps.oracles ++ AggOps.oracles ++ SketchOps.oracles ++
      SampleOps.oracles ++ LinkOps.oracles ++ RankOps.oracles ++
      CorpusOps.oracles ++ QualityOps.oracles ++ ArticleOps.oracles ++
      graft.streaming.StreamingOps.oracles
}
