package graft.model

import java.sql.Timestamp

/** Typed row models for the pipeline tables (SURVEY.md §1.2).
  * Fixed schemas, declared up front — the reference infers schemas from
  * CSV/JSON (`main_scripts/step0_mimic3_data_processing.py:62`); we never do.
  */

/** Input table per BASELINE.json input_hint:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING). */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Dictionary / ontology-map analogue (reference: ORDO2UMLS xlsx, 4,064×15,
  * multi-valued columns as proper arrays — SURVEY.md §1.1). */
case class DictEntry(
    entity_id: String,
    canonical: String,
    aliases: Array[String],
    keys: Array[String])

/** A mention extracted from a page (reference: SemEHR annotation,
  * `main_scripts/step0_mimic3_data_processing.py:163-202`). */
case class Mention(
    url: String,
    surface: String,
    begin: Int,
    end: Int,
    ctx: String)

/** Gold pair fixture row — every labeled pair shares a blocking key
  * (BASELINE.json metric; mirrors the reference's gold CSV keyed rows,
  * `data annotation/README.md:20-36`). split: "valid" | "test". */
case class GoldPair(
    url_a: String,
    url_b: String,
    block_key: String,
    gold: Int,
    split: String)

/** Planted entity truth per page (cluster_id = entity the page mentions). */
case class GoldCluster(url: String, cluster_id: String)

/** Per-stage, per-partition lineage/metrics row (north_rule: "per-partition
  * lineage + metrics"). */
case class StageMetric(
    run_id: String,
    stage: String,
    partition_id: Int,
    rows: Long,
    wall_ms: Long)
