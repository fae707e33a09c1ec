package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.gen.{Synth, SynthParams}
import graft.ops.Extract

/** Dev tool: decompose the s0 stage — synthetic generation vs
  * canonicalize/snapshot/invariant — with noop sinks (guide §1.4).
  * Usage: GenProbe [nPages] [reps]
  */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val nPages = args.lift(0).map(_.toInt).getOrElse(50000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.Partitioning.shufflePartitions(cpus.toInt, nPages).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = SynthParams(nPages = nPages, nEntities = math.max(200, nPages / 25))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"GENPROBE $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to reps).foreach { _ =>
      time("gen_only") { noop(Synth.pages(spark, p).toDF()) }
      time("gen_canon") { noop(Extract.canonicalized(Synth.pages(spark, p).toDF())) }
      time("gen_snapshot") { noop(Extract.latestSnapshot(
        Extract.canonicalized(Synth.pages(spark, p).toDF()))) }
      time("s0_full") { noop(Extract.withInvariant(Extract.latestSnapshot(
        Extract.canonicalized(Synth.pages(spark, p).toDF())))) }
      // ANN sign-bucket decomposition over the sf0.1 embeddings table
      val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      time("ann_signbucket") { noop(embs.withColumn("bucket",
        graft.ops.Ann.signBucket(col("embedding"), 8, 42L))) }
      time("ann_write") {
        val d = java.nio.file.Files.createTempDirectory("genprobe-ann").toString
        graft.ops.Ann.writeBucketed(embs, d)
        scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
      }
      // g11 decomposition: embed materialization vs the near-dup tail
      val docsEmb = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id").as("vec_id"),
          graft.functions.hash_embed(col("text"), 256, 42L).as("embedding"))
      time("g11_embed_only") { noop(docsEmb) }
      time("g11_bucketed") { noop(docsEmb.select(col("vec_id"),
        graft.ops.Ann.signBucket(col("embedding"), 12, 42L).as("bucket"))) }
      time("g11_full") {
        graft.ops.Dedup.embeddingNearDup(spark, docsEmb, threshold = 0.9).count()
        ()
      }
    }
    spark.stop()
  }
}
