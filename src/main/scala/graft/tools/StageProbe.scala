package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._
import graft.ops.Scoring

/** Dev tool: isolate the cost of each scoring feature over a saved pairs
  * checkpoint (usage: StageProbe <ckptDir>). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/prof32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pairs = spark.read.parquet(s"$dir/s3_pairs")
    val mentions = spark.read.parquet(s"$dir/s1_mentions")
    val hydrated = Scoring.hydrate(pairs, mentions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hydrated.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }
    time("baseline") { hydrated.select(count(lit(1))).head().getLong(0) }
    time("jw") { hydrated.select(jaro_winkler(col("surface_a"), col("surface_b")).as("x"))
      .agg(sum(when(col("x") > 2, 1).otherwise(0))).head(); hydrated.count() }
    time("lev") { hydrated.select(lev_ratio(col("surface_a"), col("surface_b")).as("x"))
      .agg(count(when(col("x") > 2, 1))).head(); hydrated.count() }
    time("jac") { hydrated.select(token_jaccard(col("surface_a"), col("surface_b")).as("x"))
      .agg(count(when(col("x") > 2, 1))).head(); hydrated.count() }
    time("cos") { hydrated.select(cosine_sim(
      hash_embed(col("ctx_a")), hash_embed(col("ctx_b"))).as("x"))
      .agg(count(when(col("x") > 2, 1))).head(); hydrated.count() }
    time("dedup") { Scoring.dedupBest(Scoring.withScore(
      Scoring.withFeatures(hydrated))).count() }
    spark.stop()
  }
}
