package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.{MediaFeatures, MediaRow}

/** The multimodal plumbing contract: the decode seam is a labeled stub
  * (no codecs in this container) but everything AROUND it — binary
  * schema, partition-batched typed transform, feature-array output —
  * must behave like the real thing would.
  */
class MultimodalSpec extends SparkTestBase {

  test("decodeStub is deterministic and total (null/empty payloads)") {
    val bytes = Array[Byte](0, 31, 32, 64, -1, -128)
    val a = MultimodalOps.decodeStub(MediaRow(7L, bytes))
    val b = MultimodalOps.decodeStub(MediaRow(7L, bytes.clone()))
    // Array equality is referential; compare fields + feature contents
    assert((a.media_id, a.byte_len, a.width, a.height, a.fmt, a.features.toSeq)
      === (b.media_id, b.byte_len, b.width, b.height, b.fmt, b.features.toSeq))
    assert(a.byte_len === 6L)
    // histogram mass equals byte count; buckets are (unsigned byte) >> 5
    assert(a.features.map(_.toLong).sum === 6L)
    assert(MultimodalOps.decodeStub(MediaRow(1L, null)).byte_len === 0L)
    assert(MultimodalOps.decodeStub(MediaRow(2L, Array.emptyByteArray)).fmt === "img")
  }

  test("decodeAll runs the batched typed path and preserves every row") {
    import spark.implicits._
    val media = (0L until 257L)
      .map(i => MediaRow(i, Array.fill((i % 11).toInt)(i.toByte)))
      .toDS()
      .repartition(7) // multiple partitions: the mapPartitions seam must not drop or dup
    val out: Seq[MediaFeatures] = MultimodalOps.decodeAll(spark, media).collect().toSeq
    assert(out.length === 257)
    assert(out.map(_.media_id).distinct.length === 257)
    // distributed result identical to the local stub per row
    val local = (0L until 257L)
      .map(i => MultimodalOps.decodeStub(MediaRow(i, Array.fill((i % 11).toInt)(i.toByte))))
    assert(out.sortBy(_.media_id).map(f => (f.byte_len, f.width, f.height, f.fmt, f.features.toSeq))
      === local.map(f => (f.byte_len, f.width, f.height, f.fmt, f.features.toSeq)))
  }

  test("resize math fits the 224 box and preserves aspect ordering") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, Array.fill(100)(1.toByte)),
      MediaRow(2L, Array.fill(321)(2.toByte))).toDS()
    val rows = MultimodalOps.decodeAll(spark, media)
      .selectExpr("media_id", "width", "height",
        "width * 224L div greatest(width, height) as out_w",
        "height * 224L div greatest(width, height) as out_h")
      .collect()
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ow <= 224 && oh <= 224 && math.max(ow, oh) === 224)
      assert((w >= h) === (ow >= oh))
    }
  }
}
