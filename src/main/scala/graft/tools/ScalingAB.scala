package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Pipeline, PipelineConfig}
import graft.gen.{Synth, SynthParams}

/** Dev tool: interleaved A/B of shuffle-partition settings for the full
  * pipeline inside ONE JVM (controls for JIT warmup and slow host-load
  * drift, which single back-to-back runs cannot).
  * Usage: ScalingAB <nPages> <nEntities> <p1,p2,...> [reps]
  */
object ScalingAB {
  def main(args: Array[String]): Unit = {
    val nPages = args(0).toInt
    val nEntities = args(1).toInt
    val ps = args(2).split(",").map(_.trim)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = SynthParams(nPages = nPages, nEntities = nEntities)
    val pages = Synth.pages(spark, p).toDF()
    val dict = Synth.dict(spark, p).toDF()
    (1 to reps).foreach { rep =>
      ps.foreach { part =>
        spark.conf.set("spark.sql.shuffle.partitions", part)
        val dir = s"/dev/shm/ab-$part"
        org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(dir), true)
        val t0 = System.nanoTime()
        val r = Pipeline.run(spark, pages, dict,
          PipelineConfig(checkpointDir = dir, resume = false, runId = s"ab$part"))
        r.clusters.count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"AB rep=$rep parts=$part%-5s wall=$wall%7.1f s  load=" +
          scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
      }
    }
    spark.stop()
  }
}
