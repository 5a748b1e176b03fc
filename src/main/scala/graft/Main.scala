package graft

import graft.pipeline.{ExtractJob, ExtractPipeline}
import org.apache.spark.sql.SparkSession

/** spark-submit entry point (SURVEY §7.1 module 5):
  *
  * {{{
  *   spark-submit --class graft.Main graft.jar \
  *     --input  /data/pages        (parquet/iceberg dir of the pages table)
  *     --output /data/extracted    (day-partitioned parquet output)
  *     --ledger /data/extracted/_ledger   (commit ledger for resume)
  *     [--partitions N]            (url-hash repartition width; default
  *                                  3x defaultParallelism)
  *     [--max-bytes B]             (poison-pill size cap, default 64 MiB)
  *     [--host-salt S]             (>1 = partition by (host, salt bucket)
  *                                  instead of url hash — keeps rows
  *                                  host-grouped while spreading giant
  *                                  hosts over S buckets)
  * }}}
  *
  * On a cluster the session master/resources come from spark-submit; the
  * local[*] fallback is for ad-hoc runs. Re-running after a kill resumes:
  * committed days are pruned before any html byte is read.
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val input = opts.getOrElse("input",
      sys.error("--input <pages parquet dir> is required"))
    val output = opts.getOrElse("output",
      sys.error("--output <dir> is required"))
    val ledger = opts.getOrElse("ledger", s"$output/_ledger")

    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val partitions = opts.get("partitions").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism * 3)
    val maxBytes = opts.get("max-bytes").map(_.toInt).getOrElse(64 << 20)
    val hostSalt = opts.get("host-salt").map(_.toInt).getOrElse(0)

    val pages = spark.read.parquet(input)
    val res = ExtractJob.run(spark, pages, output, ledger,
      ExtractPipeline.Conf(repartition = partitions, maxBytes = maxBytes,
        hostSalt = hostSalt))

    println(
      s"""{"days_processed":${res.daysProcessed.length},"days_skipped":${res.daysSkipped},""" +
        s""""docs_ok":${res.docsOk},"docs_failed":${res.docsFailed},"wall_ms":${res.wallMs}}""")
    spark.stop()
  }
}
