package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Blocking, Extract}

/** Gold-pair fixture builder: labeled candidate pairs sharing a blocking key
  * (the BASELINE.json metric is defined exactly on such pairs). Plays the
  * role of the reference's gold CSV (`data annotation/README.md:20-36`):
  * keyed rows, explicit 0/1 labels, a keyed validation/test split mirroring
  * its 400/673 slice — but keyed by (url_a, url_b), never positional
  * (SURVEY.md O2/J9).
  */
object GoldGen {

  /** Labeled pairs: every candidate pair the blocking stage produces on the
    * fixture, labeled gold=1 iff both urls carry the same planted entity.
    * split: hash-bucketed 40% "valid" / 60% "test" (FIXTURES.md §3). */
  def goldPairs(spark: SparkSession, p: SynthParams,
      maxBlock: Int = 1024, saltThreshold: Int = 64, nSalts: Int = 16): DataFrame = {
    val pages = Extract.withInvariant(
      Extract.latestSnapshot(Synth.pages(spark, p).toDF()))
    val mentions = Extract.mentions(pages)
    val dict = Synth.dict(spark, p).toDF()
    // pairs are numeric-only (mid_a, mid_b, block_id); re-attach urls from
    // the mention table like Scoring.hydrate does
    val mu = mentions.select(col("mention_id"), col("url"))
    val pairs = Blocking.pairs(mentions, dict, maxBlock, saltThreshold, nSalts, p.seed)
      .join(broadcast(mu.select(col("mention_id").as("mid_a"), col("url").as("url_a"))), Seq("mid_a"))
      .join(broadcast(mu.select(col("mention_id").as("mid_b"), col("url").as("url_b"))), Seq("mid_b"))

    val truth = Synth.goldClusters(spark, p).toDF()
    val ta = truth.select(col("url").as("url_a"), col("cluster_id").as("ent_a"))
    val tb = truth.select(col("url").as("url_b"), col("cluster_id").as("ent_b"))

    pairs
      .join(ta, Seq("url_a"), "left")
      .join(tb, Seq("url_b"), "left")
      .select(
        col("url_a"), col("url_b"), col("block_id"),
        when(col("ent_a").isNotNull && col("ent_a") === col("ent_b"), 1)
          .otherwise(0).as("gold"),
        when(pmod(xxhash64(col("url_a"), col("url_b")), lit(10)) < 4, "valid")
          .otherwise("test").as("split"))
  }
}
