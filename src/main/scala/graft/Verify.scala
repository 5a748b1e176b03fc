package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (NOT used by the driver): comma-separated
    // exact query names; unset = run everything.
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // DRIVER CONTRACT (round-1 postmortem): the driver keys its oracle
    // lookup by the parquet dump's *filename* ("q_foo.parquet"), while the
    // natural key here is the bare query name ("q_foo"). Round 1 emitted
    // only bare keys -> 0/73 key overlap -> every query recorded
    // err:"no_oracle". Emit every oracle under BOTH keys so either join works.
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Loud drift check: every dump dir written above must have an oracle
    // entry under its filename key. A missing key is a contract bug that
    // would silently zero the round's correctness record — fail the run.
    val dumped = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.endsWith(".parquet")).map(_.getName)
    val orphans = dumped.filterNot(d =>
      SparkEntry.oracleSql.contains(d.stripSuffix(".parquet")))
    if (orphans.nonEmpty && only.isEmpty) {
      System.err.println(s"[verify] FATAL: dumps without oracle entry: ${orphans.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
