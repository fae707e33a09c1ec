package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.{Synth, SynthParams}
import graft.ops.Dedup

/** Dev tool: A/B of the incremental near-dup attach
  * (Dedup.minhashNearDupAttach) vs a full from-scratch re-dedup
  * (Dedup.minhashNearDup) over base+delta — the dedup-family analogue of
  * IncrAB. The corpus is the synthetic page table's snapshots treated as
  * documents (snapshots of one url are deterministic perturbed copies, so
  * the corpus has a realistic near-dup rate), written to parquet first so
  * both sides read the same on-disk input.
  *
  * The committed state (band index + edges + assignment) is built and
  * written once OUTSIDE the timed region — a deployment already has it.
  * The timed comparison is the operator's actual choice when a crawl delta
  * lands: re-dedup the corpus, or attach.
  *
  * Usage: DedupIncrAB <nDocs> <deltaPct> [reps]
  */
object DedupIncrAB {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toInt
    val deltaPct = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        graft.Partitioning.shufflePartitions(cpus.toInt, nDocs.toLong).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val p = SynthParams(nPages = nDocs, nEntities = math.max(200, nDocs / 25))
    val root = Files.createTempDirectory("graft-dedupincrab").toString
    // snapshot rows as documents: doc_id = 63-bit hash of (url, warc_ts)
    // (non-negative, so lpad string order == numeric order in the CC keys)
    Synth.pages(spark, p).toDF()
      .select(xxhash64(col("url"), col("warc_ts"))
          .bitwiseAND(lit(Long.MaxValue)).as("doc_id"),
        col("text"))
      .write.mode("overwrite").parquet(s"$root/docs.parquet")
    val all = spark.read.parquet(s"$root/docs.parquet")
    val isDelta = pmod(xxhash64(col("doc_id")), lit(100)) < deltaPct
    val nAll = all.count()
    val nDelta = all.filter(isDelta).count()
    println(s"DEDUP-INCR-AB corpus=$nAll docs delta=$nDelta docs " +
      f"(${100.0 * nDelta / nAll}%.1f%%)")

    // committed base state: built + written once, NOT part of the comparison
    val tB0 = System.nanoTime()
    Dedup.commitDedupState(
      Dedup.minhashDedupState(spark, all.filter(!isDelta)), s"$root/state")
    println(f"DEDUP-INCR-AB base build wall=${(System.nanoTime() - tB0) / 1e9}%.1f s")

    def load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    (1 to reps).foreach { rep =>
      // A: full from-scratch dedup over base+delta
      val tF0 = System.nanoTime()
      val nFull = Dedup.minhashNearDup(spark, all).count()
      val wallFull = (System.nanoTime() - tF0) / 1e9

      // B: attach the delta against the committed on-disk state
      val state = Dedup.dedupStateFromDir(spark, s"$root/state")
      val tA0 = System.nanoTime()
      val res = Dedup.minhashNearDupAttach(spark, state, all, all.filter(isDelta))
      val nAttach = res.dups.count()
      val wallAttach = (System.nanoTime() - tA0) / 1e9

      println(f"DEDUP-INCR-AB rep=$rep full=$wallFull%.1f s attach=$wallAttach%.1f s " +
        f"speedup=${wallFull / wallAttach}%.2fx dups_full=$nFull dups_attach=$nAttach " +
        s"equal=${nFull == nAttach} loadavg=[$load]")

      // C: takedown — detach a 2%-of-BASE slice from the committed state vs
      // a full from-scratch re-dedup of the remaining corpus
      val isDetached = pmod(xxhash64(col("doc_id")), lit(100)) >= deltaPct &&
        pmod(xxhash64(col("doc_id")), lit(100)) < 2 * deltaPct
      val remaining = all.filter(!isDelta && !isDetached)
      val tFr0 = System.nanoTime()
      val nFullR = Dedup.minhashNearDup(spark, remaining).count()
      val wallFullR = (System.nanoTime() - tFr0) / 1e9
      val state2 = Dedup.dedupStateFromDir(spark, s"$root/state")
      val tD0 = System.nanoTime()
      val det = Dedup.minhashNearDupDetach(spark, state2, remaining,
        all.filter(!isDelta && isDetached).select("doc_id"))
      val nDetach = det.dups.count()
      val wallDetach = (System.nanoTime() - tD0) / 1e9
      println(f"DEDUP-INCR-AB rep=$rep full_remaining=$wallFullR%.1f s " +
        f"detach=$wallDetach%.1f s speedup=${wallFullR / wallDetach}%.2fx " +
        f"dups_full=$nFullR dups_detach=$nDetach equal=${nFullR == nDetach} " +
        s"loadavg=[$load]")
    }
    spark.stop()
    scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
  }
}
