package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: interleaved A/B of shuffle-partition settings for the
  * BENCH g01 query (SparkEntry.entry — the 800-page in-memory fixture
  * pipeline) inside ONE JVM. g01 is fixed-overhead-bound (tiny data, many
  * barriers), so it is the query most sensitive to task-count settings; this
  * harness measures exactly what the bench measures, minus host drift.
  * Usage: EntryAB <p1,p2,...> [reps]
  */
object EntryAB {
  def main(args: Array[String]): Unit = {
    val ps = args(0).split(",").map(_.trim)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { rep =>
      ps.foreach { part =>
        spark.conf.set("spark.sql.shuffle.partitions", part)
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.entry(spark).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"ENTRY-AB rep=$rep parts=$part%-5s wall=$wall%6.1f s rows=$n  load=" +
          scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
      }
    }
    spark.stop()
  }
}
