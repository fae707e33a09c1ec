package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-hop ontology propagation + per-document entity rollup — the
  * product-path analogue of the reference's UMLS→ORDO→ICD10→ICD9 chains
  * (`main_scripts/rare_disease_id_util.py:278-322`,
  * `main_scripts/step9_processing_all_documents.py:162-187`) and its
  * admission-level union-dedup aggregation (`:241-252`).
  *
  * Each hop is a (child, parent) dimension table joined BROADCAST (ontology
  * dimensions are small — 4k rows in the reference), so the whole chain is
  * shuffle-free until the single per-document aggregation at the end; the
  * reference's per-row memo dicts (`:146-159,221-228`) disappear into these
  * materialized dimensions (SURVEY.md J6). Ontology gating (the reference's
  * isNotGroupOfDisorders SPARQL rule, memoized at `:154-159`) is expressed by
  * pre-filtering a hop table — a lazily-materialized dimension, exactly what
  * the reference's pickle cache was.
  */
object Taxonomy {

  /** Per-document entity links: mentions whose normalized surface exactly
    * matches a dictionary key (the J3/J4 dictionary path), one row per
    * (url, entity_id). */
  def docEntities(mentions: DataFrame, dict: DataFrame): DataFrame = {
    val keys = dict.select(col("entity_id"), explode(col("keys")).as("norm_key"))
    mentions.join(broadcast(keys), Seq("norm_key"))
      .select(col("url"), col("entity_id"))
      .distinct()
  }

  /** Chain `hops` (each a (child, parent) table named by its output column)
    * from per-document entity links, then roll everything up per document
    * with union-dedup: output (url, entities, <hop1 name>, <hop2 name>, ...)
    * where every column is a sorted deduped array. A child with no parent in
    * a hop contributes nothing at that level and deeper (left join + null
    * drop in collect_set), mirroring the reference's tolerated lookup misses
    * (`main_scripts/step9_processing_all_documents.py:236-240`). */
  def docRollup(docEnts: DataFrame, hops: Seq[(DataFrame, String)]): DataFrame = {
    var cur = docEnts.select(col("url"), col("entity_id").as("lvl0"))
    hops.zipWithIndex.foreach { case ((hop, _), i) =>
      val dim = hop.select(col("child").as(s"lvl$i"), col("parent").as(s"lvl${i + 1}"))
      cur = cur.join(broadcast(dim), Seq(s"lvl$i"), "left")
    }
    val aggs = sort_array(collect_set(col("lvl0"))).as("entities") +:
      hops.zipWithIndex.map { case ((_, name), i) =>
        sort_array(collect_set(col(s"lvl${i + 1}"))).as(name)
      }
    cur.groupBy("url").agg(aggs.head, aggs.tail: _*)
  }

  /** Convenience: dictionary-linked entities rolled up through `hops`,
    * straight from mentions — the "(url, entities ARRAY<STRING>)" product
    * stage. */
  def rollupFromMentions(mentions: DataFrame, dict: DataFrame,
      hops: Seq[(DataFrame, String)]): DataFrame =
    docRollup(docEntities(mentions, dict), hops)
}
