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
      // correctness runs on the tiny sf0.01 tables: core-count partitions
      // (the data-scaled policy's floor — see graft.Partitioning)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dump the deterministic flagship fixture to parquet OUTSIDE outDir (the
    // driver treats every outDir subdirectory as a query result): the g01
    // oracle SQL reads these files, so DuckDB replays the portable ER twin
    // over byte-identical inputs. Path is substituted for __FIXTURE_DIR__
    // in oracle_sql.json below.
    val fixDir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      System.getProperty("java.io.tmpdir", "/tmp") + "/graft_g01_fixture")
    val fp = SparkEntry.FlagshipParams
    graft.gen.Synth.pages(spark, fp).toDF().coalesce(4)
      .write.mode("overwrite").parquet(s"$fixDir/pages.parquet")
    graft.gen.Synth.dict(spark, fp).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$fixDir/dict.parquet")
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__FIXTURE_DIR__", fixDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
