package graft.streaming

import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming variant of the pipeline (SURVEY §2.9): the
  * reference's infinite poll worker (endpoint_upload.py:1282-1301, 5 s
  * interval) becomes `readStream` over the pages table processed with
  * `Trigger.AvailableNow` — same kernel, same plan, incremental source.
  * The batch-with-resume ledger (ExtractJob) stays the primary shape; this
  * is the streaming entry for continuously-landing crawl data.
  */
object StreamingOps {

  /** North-rule pages schema (BASELINE.json input_hint). */
  val PagesSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** File-source stream of pages (Iceberg-snapshot stand-in: each new file
    * under `dir` is an increment).
    */
  def pagesStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(PagesSchema)
      .option("maxFilesPerTrigger", "4") // bounded micro-batches
      .parquet(dir)

  /** Streaming extraction: identical kernel invocation; mapPartitions and
    * the url-hash repartition are both streaming-compatible.
    */
  def extractStream(spark: SparkSession, pages: DataFrame,
      conf: ExtractPipeline.Conf = ExtractPipeline.Conf()): DataFrame =
    ExtractPipeline.extract(spark, pages, conf).toDF()

  /** Event-time tumbling-window rollup with a watermark: docs per hour per
    * kind — the monitoring aggregation a crawl pipeline runs beside the
    * extraction sink. Late pages beyond 2 hours are dropped by watermark.
    */
  def hourlyDocCounts(extracted: DataFrame): DataFrame =
    extracted
      .withWatermark("warc_ts", "2 hours")
      .groupBy(window(col("warc_ts"), "1 hour"), col("doc_kind"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(col("window.start").as("window_start"), col("doc_kind"),
        col("n_docs"), col("sum_chars"))
}
