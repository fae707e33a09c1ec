package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Blocking, Clustering, Extract, Metrics, Scoring}

/** End-to-end ER pipeline with per-stage parquet checkpoints, resume, and
  * lineage metrics.
  *
  * Reference analogue: `main_scripts/run_main_steps.py` chains four Python
  * subprocesses exchanging pickle files (:39-52); each pickle handoff becomes
  * a committed parquet stage checkpoint here, and its load-if-exists caches
  * (`main_scripts/sent_bert_emb_viz_util.py:406-416`) become resume-from-
  * snapshot semantics (SURVEY.md S5, §4.1): a stage whose checkpoint has a
  * _SUCCESS marker is read back, not recomputed.
  *
  * No Iceberg jars ship in this sandbox (SURVEY.md §7.4), so the commit
  * protocol is parquet-directory + _SUCCESS (Spark's atomic job commit); the
  * writer is confined to this object so an Iceberg catalog can be slotted in.
  */
case class PipelineConfig(
    checkpointDir: String,
    resume: Boolean = true,
    maxBlock: Int = 1024,
    saltThreshold: Int = 64,
    nSalts: Int = 16,
    weights: Scoring.Weights = Scoring.Weights(),
    embedDim: Int = 256,
    ctxWindow: Int = 4,
    seed: Long = 42L,
    runId: String = "run",
    /** When true, every CC iteration commits to parquet under <ckpt>/cc/ so
      * a crash mid-clustering resumes inside the loop; when false (default),
      * iterations cut lineage with localCheckpoint and only the final
      * clusters table is durable. At 10^12-doc scale set true and checkpoint
      * every K iterations; at bench scale the per-iteration parquet
      * round-trips dominate CC wall time. */
    ccDurableIterations: Boolean = false)

case class PipelineResult(
    pages: DataFrame,
    mentions: DataFrame,
    pairs: DataFrame,
    scored: DataFrame,
    clusters: DataFrame)

object Pipeline {

  private def stagePath(cfg: PipelineConfig, stage: String) =
    s"${cfg.checkpointDir}/$stage"

  private def committed(path: String): Boolean =
    Files.exists(Paths.get(path, "_SUCCESS"))

  /** Run one stage: resume from the last committed snapshot if present,
    * otherwise compute, commit, and append lineage metrics. */
  def stage(spark: SparkSession, cfg: PipelineConfig, name: String)
      (compute: => DataFrame): DataFrame = {
    val path = stagePath(cfg, name)
    if (cfg.resume && committed(path)) {
      spark.read.parquet(path)
    } else {
      val t0 = System.nanoTime()
      compute.write.mode("overwrite").parquet(path)
      val out = spark.read.parquet(path)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      Metrics.stageMetrics(out, cfg.runId, name, wallMs)
        .write.mode("append").parquet(s"${cfg.checkpointDir}/metrics")
      out
    }
  }

  /** Full pipeline: pages -> clusters. Every stage checkpoints; a rerun with
    * resume=true picks up after the last committed stage (north_rule). */
  def run(spark: SparkSession, pagesIn: DataFrame, dict: DataFrame,
      cfg: PipelineConfig): PipelineResult = {

    val pages = stage(spark, cfg, "s0_pages") {
      Extract.withInvariant(Extract.latestSnapshot(pagesIn))
    }

    val mentions = stage(spark, cfg, "s1_mentions") {
      Extract.mentions(pages, cfg.ctxWindow)
    }

    // blocks are materialized as their own checkpoint: the pair self-join
    // reads them multiple times, and a resumed run skips re-blocking
    val blocks = stage(spark, cfg, "s2_blocks") {
      Blocking.blocks(mentions, dict, cfg.maxBlock, cfg.seed)
    }

    val pairs = stage(spark, cfg, "s3_pairs") {
      Blocking.pairsFromBlocks(blocks, cfg.saltThreshold, cfg.nSalts)
    }

    val scored = stage(spark, cfg, "s4_scored") {
      Scoring.score(pairs, mentions, cfg.weights, cfg.embedDim, cfg.seed)
    }

    val clusters = stage(spark, cfg, "s5_clusters") {
      Clustering.clusters(spark, scored,
        pages.filter(col("lang") === "en" && col("invariant_ok")),
        if (cfg.ccDurableIterations) Some(s"${cfg.checkpointDir}/cc") else None)
    }

    PipelineResult(pages, mentions, pairs, scored, clusters)
  }
}
