package graft

import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.SparkSession

/** Component timing probe for the scaling benchmark: isolates scan,
  * shuffle, and kernel cost at two parallelism levels so the bench
  * measures the stage that dominates at cluster scale (the kernel) and
  * reports the disk-bound local shuffle separately.
  * Usage: runMain graft.BenchProbe [docs]
  */
object BenchProbe {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toInt).getOrElse(150000)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_bench_pages_${graft.gen.PagesGen.CorpusVersion}_$docs"
    // generate with a 32-cpu session if absent
    locally {
      val s = session(32)
      import s.implicits._
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        s.range(docs).repartition(32)
          .mapPartitions(_.map(i => graft.gen.PagesGen.genPage(i, seed = 42L, hosts = 200).row))
          .write.mode("overwrite").parquet(dir)
      }
      s.stop()
    }
    // interleaved rounds: noisy-neighbor steal hits both levels equally
    // in expectation; min-per-level approximates the unloaded machine
    val times = scala.collection.mutable.Map(2 -> List.empty[Double], 8 -> List.empty[Double])
    (1 to 5).foreach { round =>
      Seq(2, 8).foreach { cpus =>
        val s = session(cpus)
        def kernelShuffle(): Long = ExtractPipeline
          .extract(s, s.read.parquet(dir), ExtractPipeline.Conf(repartition = cpus))
          .filter(_.error == null).count()
        if (round == 1) kernelShuffle() // one warmup per first use
        val (t, n) = time(kernelShuffle())
        times(cpus) = t :: times(cpus)
        println(f"PROBE round=$round cpus=$cpus%2d t=$t%.2fs n=$n")
        s.stop()
      }
    }
    val t8 = times(2).min; val t32 = times(8).min
    println(f"PROBE MIN t8=$t8%.2f t32=$t32%.2f eff=${(t8 / t32) / 4.0}%.3f")
  }
}
