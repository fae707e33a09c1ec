package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Pairwise scoring stage: the batched similarity ensemble + linear scorer.
  *
  * Reference analogue: the mention↔concept confirmation scorer — two weak
  * rules plus a logistic regression over mean-pooled contextual BERT
  * embeddings (`main_scripts/step1_tr_data_creat_ment_disamb.py:104,69-72`;
  * `main_scripts/sent_bert_emb_viz_util.py:560-572,809-812`), ensembled with
  * rule gates (`main_scripts/evaluation_util.py:17-38`). Here the features are
  * Jaro-Winkler, Levenshtein ratio, token-set Jaccard (surface features — the
  * analogue of the reference's string-level rules) and the context
  * hash-embedding cosine (the analogue of its BERT scorer); the LR decision
  * `clf.predict(X)` collapses to `w·x + b > 0` — pure column arithmetic
  * (SURVEY.md §2.8 "linear scorer").
  *
  * Scale notes: every feature is a codegen'd expression over columns already
  * co-partitioned by the blocking shuffle — scoring adds NO shuffle. The only
  * shuffle in this stage is the best-pair dedup window (url_a,url_b), which
  * reuses the pair key.
  */
object Scoring {

  /** Ensemble weights + decision threshold. Defaults were fitted by grid
    * search on the synthetic validation split (mirroring the reference tuning
    * p,l on its first-400 validation slice,
    * `main_scripts/step1_tr_data_creat_ment_disamb.py:41-44`); see
    * MetricsSpec/PipelineSpec which assert the resulting test-split F1. */
  /** Fitted on the 5k-page fixture's validation split (logistic regression,
    * then rounded), validated on 2k/5k/20k test splits at F1 >= 0.9999.
    * The negative lev/jac weights are the learned trap rule: "surfaces match
    * exactly but contexts disagree" marks the shared-abbreviation ambiguity
    * class as non-match — the same job the reference's context model does
    * against its ambiguous frequent mentions
    * (`main_scripts/sent_bert_emb_viz_util.py:926`). */
  case class Weights(
      wJw: Double = 4.0,
      wLev: Double = -2.0,
      wJac: Double = -4.0,
      wCos: Double = 22.0,
      bias: Double = -4.0,
      threshold: Double = 1.55)

  /** Attach feature + score columns to candidate pairs. Expects columns
    * surface_a, surface_b, ctx_a, ctx_b. */
  def withFeatures(pairs: DataFrame, embedDim: Int = 256,
      seed: Long = 42L): DataFrame =
    pairs
      .withColumn("jw", jaro_winkler(col("surface_a"), col("surface_b")))
      .withColumn("lev", lev_ratio(col("surface_a"), col("surface_b")))
      .withColumn("jac", token_jaccard(col("surface_a"), col("surface_b")))
      .withColumn("cos", cosine_sim(
        hash_embed(col("ctx_a"), embedDim, seed),
        hash_embed(col("ctx_b"), embedDim, seed)))

  def withScore(featured: DataFrame, w: Weights = Weights()): DataFrame =
    featured
      .withColumn("score",
        lit(w.wJw) * col("jw") + lit(w.wLev) * col("lev") +
          lit(w.wJac) * col("jac") + lit(w.wCos) * col("cos") + lit(w.bias))
      .withColumn("is_match", col("score") > lit(w.threshold))

  /** One row per (url_a, url_b): keep the best-scoring mention pair across
    * shared blocks (SURVEY.md §2.5 — the only SQL window besides snapshot
    * dedup). */
  def dedupBest(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url_a"), col("url_b"))
      .orderBy(col("score").desc, col("block_key").asc, col("surface_a").asc,
        col("surface_b").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full scoring stage. */
  def score(pairs: DataFrame, w: Weights = Weights(), embedDim: Int = 256,
      seed: Long = 42L): DataFrame =
    dedupBest(withScore(withFeatures(pairs, embedDim, seed), w))
}
