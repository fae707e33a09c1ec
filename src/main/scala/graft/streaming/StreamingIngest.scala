package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Extract

/** Structured-Streaming ingest path for the pages table.
  *
  * The batch pipeline is the product (the reference has no streaming,
  * SURVEY.md §2.10, and the north_rule is batch spark-submit); this module
  * exists because a web-crawl source is naturally incremental: pages arrive
  * as (url, warc_ts, html, text, lang) micro-batches, and the batch
  * pipeline's snapshot-dedup + extraction stages have exact streaming
  * equivalents:
  *
  *  - snapshot dedup -> dropDuplicatesWithinWatermark("url") with a warc_ts
  *    watermark. NOT identical to the batch stage: it keeps the
  *    FIRST-ARRIVING row per url inside the watermark, while batch
  *    latestSnapshot keeps the max-warc_ts row — when two snapshots of one
  *    url land in the same watermark window in ts-descending arrival order,
  *    the two paths keep different rows. Exact latest-wins is restored at
  *    sink compaction: run batch Extract.latestSnapshot over the committed
  *    sink before blocking (which is what the product path below does);
  *  - extraction + invariant -> identical narrow projections (shared code);
  *  - downstream blocking/scoring stay batch jobs over the committed sink —
  *    the streaming stage's parquet sink IS the batch pipeline's s0 input,
  *    and s0 re-applies latestSnapshot, making the end-to-end result
  *    arrival-order-independent.
  *
  * Tested with MemoryStream in StreamingSpec; at scale the source would be
  * `readStream.format("parquet"/"kafka")` over crawl deliveries.
  */
object StreamingIngest {

  /** Streaming transform: watermarked url-dedup + extraction invariant +
    * mention extraction. Input must be a streaming DataFrame with the pages
    * schema. */
  def ingest(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    Extract.withInvariant(
      pages
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("url")))

  /** Streaming mention counts per language — a stateful windowed aggregation
    * demonstrating event-time windows over warc_ts. */
  def mentionRate(pages: DataFrame, watermark: String = "1 hour",
      window: String = "10 minutes"): DataFrame =
    ingest(pages, watermark)
      .filter(col("lang") === "en" && col("invariant_ok"))
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window),
        col("lang"))
      .agg(count(lit(1)).as("n_pages"))
}
