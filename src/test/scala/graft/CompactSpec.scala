package graft

import graft.pipeline.ParquetFormat
import org.apache.spark.sql.functions._

/** Small-file compaction over the parquet TableFormat: layout changes,
  * contents never do, and a second pass is a no-op.
  */
class CompactSpec extends SparkTestBase {
  import spark.implicits._

  private def fileCount(table: String, pv: String): Int =
    new java.io.File(s"$table/day=$pv").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compact bin-packs small files per partition, preserves rows, idempotent") {
    val table = tmpDir("compact") + "/t"
    // 2 partitions x 8 tiny files each (repartition before partitionBy)
    (0 until 400)
      .map(i => (i.toLong, s"row $i", if (i % 2 == 0) "a" else "b"))
      .toDF("id", "payload", "day")
      .repartition(8)
      .write.partitionBy("day").parquet(table)
    assert(fileCount(table, "a") === 8)

    val expected = ParquetFormat.read(spark, table)
      .orderBy("id").collect().map(_.toString).toSeq

    val stats = ParquetFormat.compact(spark, table, "day", targetBytes = 64L * 1024 * 1024)
    assert(stats.partitionsRewritten === 2L)
    assert(stats.filesBefore === 16L)
    assert(stats.filesAfter === 2L)
    assert(fileCount(table, "a") === 1 && fileCount(table, "b") === 1)

    val got = ParquetFormat.read(spark, table)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(got === expected)

    // second pass: nothing above its desired count, nothing rewritten
    val again = ParquetFormat.compact(spark, table, "day", targetBytes = 64L * 1024 * 1024)
    assert(again.partitionsRewritten === 0L)
    assert(again.filesAfter === 2L)
  }

  test("partitions already at target are not rewritten; tiny target splits") {
    val table = tmpDir("compact2") + "/t"
    (0 until 100).map(i => (i.toLong, "x" * 50, "a")).toDF("id", "payload", "day")
      .coalesce(1).write.partitionBy("day").parquet(table)
    assert(fileCount(table, "a") === 1)
    // already one file: no-op even with a huge target
    assert(ParquetFormat.compact(spark, table, "day", 1L << 30).partitionsRewritten === 0L)
    // a 1-byte target wants more files than present -> desired >= files,
    // compaction never SPLITS (it only merges), so still untouched
    assert(ParquetFormat.compact(spark, table, "day", 1L).partitionsRewritten === 0L)
  }

  test("vacuum removes aged invisible files, keeps live ones and all data") {
    val table = tmpDir("vacuum") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "day")
      .write.partitionBy("day").parquet(table)
    val expected = ParquetFormat.read(spark, table)
      .orderBy("id").collect().map(_.toString).toSeq

    // plant orphans: a killed writer's _temporary tree (with a normally-
    // named part file INSIDE it), a .crc sidecar, the _SUCCESS marker
    val tmp = new java.io.File(s"$table/_temporary/0/task_1")
    assert(tmp.mkdirs())
    val orphanPart = new java.io.File(tmp, "part-00000.parquet")
    java.nio.file.Files.write(orphanPart.toPath, Array.fill[Byte](64)(1))
    val crc = new java.io.File(s"$table/day=a/.part-x.crc")
    java.nio.file.Files.write(crc.toPath, Array.fill[Byte](8)(1))
    // a FRESH _temporary file (in-flight writer) must survive the grace
    val live = new java.io.File(s"$table/_temporary/0/live.parquet")
    java.nio.file.Files.write(live.toPath, Array.fill[Byte](16)(1))
    // age everything except `live`
    val old = System.currentTimeMillis() - 3600 * 1000
    Seq(orphanPart, crc, tmp, tmp.getParentFile, tmp.getParentFile.getParentFile)
      .foreach(f => f.setLastModified(old))
    new java.io.File(table).listFiles().filter(_.getName == "_SUCCESS")
      .foreach(_.setLastModified(old))

    val stats = ParquetFormat.vacuum(table, graceMs = 60 * 1000)
    assert(stats.filesDeleted >= 3L) // orphan part + crc + _SUCCESS
    assert(stats.bytesFreed >= 72L)
    assert(!orphanPart.exists() && !crc.exists())
    assert(live.exists(), "fresh in-flight file must survive the grace period")
    // table content unchanged
    val after = ParquetFormat.read(spark, table)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(after === expected)
    // second pass with everything aged removes the leftover live file
    live.setLastModified(old)
    live.getParentFile.setLastModified(old)
    ParquetFormat.vacuum(table, graceMs = 60 * 1000)
    assert(!live.exists())
    assert(!new java.io.File(s"$table/_temporary").exists(),
      "emptied _temporary tree should be pruned")
  }

  test("vacuum never touches _col= partition dirs or Parquet summary files") {
    val table = tmpDir("vacuum2") + "/t"
    // a partition COLUMN may legally start with '_' — its dirs are
    // readable data, not orphans
    Seq((1L, "a"), (2L, "b")).toDF("id", "_day")
      .write.partitionBy("_day").parquet(table)
    val meta = new java.io.File(s"$table/_metadata")
    java.nio.file.Files.write(meta.toPath, Array.fill[Byte](8)(1))
    val old = System.currentTimeMillis() - 3600 * 1000
    def ageAll(f: java.io.File): Unit = {
      f.setLastModified(old)
      val kids = f.listFiles(); if (kids != null) kids.foreach(ageAll)
    }
    ageAll(new java.io.File(table))
    ParquetFormat.vacuum(table, graceMs = 60 * 1000)
    assert(meta.exists(), "_metadata summary file must survive vacuum")
    assert(new java.io.File(s"$table/_day=a").isDirectory)
    // (the junk _metadata placed above is not valid parquet — remove it
    // before reading; the point was only that vacuum must not delete it)
    meta.delete()
    assert(ParquetFormat.read(spark, table).count() === 2L)
  }
}
