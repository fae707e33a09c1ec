package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Partitioning, Pipeline, PipelineConfig}
import graft.gen.{Synth, SynthParams}

/** Dev tool: replicate the bench's er_pipeline timed body (fresh-checkpoint
  * Pipeline.run over the synthetic bench corpus + clusters.count) outside
  * Bench, with conf overrides, for A/B work on the pipeline itself.
  *
  * Usage: PipeProbe [nPages] [reps]
  * Confs via SPARK_GRAFT_CONF="k=v;k=v"; cores via SPARK_GRAFT_CPUS.
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val nPages = args.lift(0).map(_.toInt).getOrElse(50000)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Partitioning.shufflePartitions(cpus.toInt, nPages).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
          System.getProperty("java.io.tmpdir", "/tmp")))
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    spark.sparkContext.setLogLevel("WARN")
    val p = SynthParams(nPages = nPages, nEntities = math.max(200, nPages / 25))
    (1 to reps).foreach { rep =>
      val ckpt = java.nio.file.Files.createTempDirectory("graft-pipeprobe").toString
      val t0 = System.nanoTime()
      val result = Pipeline.run(spark, Synth.pages(spark, p).toDF(),
        Synth.dict(spark, p).toDF(),
        PipelineConfig(checkpointDir = ckpt, resume = false, runId = "probe"))
      val n = result.clusters.count()
      println(f"PIPEPROBE rep=$rep wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"clusters=$n  load=" +
        scala.io.Source.fromFile("/proc/loadavg").mkString.trim)
      scala.reflect.io.Directory(new java.io.File(ckpt)).deleteRecursively()
    }
    spark.stop()
  }
}
