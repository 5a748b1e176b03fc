package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-batched
  * typed transforms (the Scala analog of `mapInPandas` batches).
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs exist
  * in this container): [[decodeStub]] derives deterministic fake
  * width/height/features from the bytes. The Spark-side plumbing — binary
  * schema, batch shape, partition amortization, feature-array output — is
  * real and tested (MultimodalSpec).
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      width: Long,
      height: Long,
      fmt: String,
      features: Array[Float])

  /** STUB decoder: a real implementation would parse the container format
    * (JPEG/PNG/WAV...) here; this fake is deterministic in the payload
    * bytes so tests and oracles can bind to it.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val len = if (r.payload == null) 0L else r.payload.length.toLong
    val fmt = (len % 3) match {
      case 0 => "img"
      case 1 => "audio"
      case _ => "video"
    }
    // fake feature vector: 8 bucketed byte-histogram counts
    val hist = new Array[Float](8)
    if (r.payload != null) {
      var i = 0
      while (i < r.payload.length) {
        hist(((r.payload(i) & 0xFF) >> 5)) += 1f
        i += 1
      }
    }
    MediaFeatures(r.media_id, len, 320L + len % 320L, 240L + len % 240L, fmt, hist)
  }

  /** Batched decode over a binary column; one stub-decoder per partition
    * (amortization point for a real codec's native context).
    */
  def decodeAll(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(it => it.map(decodeStub))
  }

  /** Oracle-checkable metadata projection: documents' text bytes stand in
    * for media payloads (ASCII ⇒ byte_len == char length, which is what
    * makes the DuckDB mirror exact).
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("cast(doc_id as long) as media_id", "cast(text as binary) as payload")
      .as[MediaRow]
    decodeAll(spark, media)
      .select(col("media_id"), col("byte_len"), col("width"), col("height"), col("fmt"))
  }

  val mediaMetaSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(length(text) AS BIGINT) AS byte_len,
      |  320 + CAST(length(text) AS BIGINT) % 320 AS width,
      |  240 + CAST(length(text) AS BIGINT) % 240 AS height,
      |  CASE CAST(length(text) AS BIGINT) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS fmt
      |FROM documents""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (mediaMeta(_, _)))

  def oracles: Map[String, String] = Map(
    "q_media_meta" -> mediaMetaSql)
}
