package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: run ONE SparkEntry query (or bench override) by name against a
  * testdata dir, print its wall per rep and optionally the formatted plan.
  *
  * Usage: QProbe <name> <sfDir> [reps] [--explain] [--override]
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = args.lift(2).filter(!_.startsWith("--")).map(_.toInt).getOrElse(2)
    val explain = args.contains("--explain")
    val useOverride = args.contains("--override")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = (if (useOverride) SparkEntry.benchOverrides ++ SparkEntry.queries
              else SparkEntry.queries ++ SparkEntry.benchOverrides)(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"QPROBE $name rep=$rep wall=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
