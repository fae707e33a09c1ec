package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Scoring}

/** Dev tool: decompose s4 (scoring) and s5 (CC) wall time over a SAVED
  * pipeline checkpoint, under varying shuffle-partition counts and join
  * strategies. Usage: PerfProbe <ckptDir> <mode> [shufflePartitions]
  * modes: s4bcast | s4shuffle | s4parts | cc | hydrate
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val parts = args.lift(2).getOrElse("256")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }

    lazy val pairs = spark.read.parquet(s"$dir/s3_pairs")
    lazy val mentions = spark.read.parquet(s"$dir/s1_mentions")

    mode match {
      case "hydrate" =>
        time("hydrate_bcast") {
          Scoring.hydrate(pairs, mentions, broadcastMentions = true)
            .select(count(lit(1))).head().getLong(0)
        }
        time("hydrate_shuf") {
          Scoring.hydrate(pairs, mentions, broadcastMentions = false)
            .select(count(lit(1))).head().getLong(0)
        }
      case "s4bcast" =>
        time("s4_bcast") {
          Scoring.score(pairs, mentions, broadcastMentions = true).count()
        }
      case "s4shuffle" =>
        time("s4_shuffle") {
          Scoring.score(pairs, mentions, broadcastMentions = false).count()
        }
      case "s4steps" =>
        val hyd = Scoring.hydrate(pairs, mentions, broadcastMentions = false)
        time("features") {
          Scoring.withScore(Scoring.withFeatures(hyd))
            .select(count(when(col("score") > 0, 1))).head(); hyd.count()
        }
        time("plus_dedup") {
          Scoring.dedupBest(Scoring.withScore(Scoring.withFeatures(hyd))).count()
        }
      case "cc" =>
        val scored = spark.read.parquet(s"$dir/s4_scored")
        val pages = spark.read.parquet(s"$dir/s0_pages")
        time(s"cc_p$parts") {
          Clustering.clusters(spark, scored,
            pages.filter(col("lang") === "en" && col("invariant_ok"))).count()
        }
    }
    spark.stop()
  }
}
