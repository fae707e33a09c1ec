package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{lsh_band_keys, minhash_sig}

/** Blocking stage: dictionary-key blocking + MinHash-LSH blocking, block-size
  * capping (stop-key rule) and salted pair generation for hot blocks.
  *
  * Reference analogues:
  *  - dictionary blocking = the UMLS-dictionary semi-join that gates SemEHR
  *    candidates (`main_scripts/step0_mimic3_data_processing.py:112,195`;
  *    dict built at `main_scripts/mimic3_data_processing_util.py:7-24`) — here
  *    a broadcast equi-join of normalized surface keys against exploded dict
  *    aliases (SURVEY.md J3/J4: containment joins normalized to equi-joins);
  *  - block-size cap = the prevalence rule dropping ultra-frequent concepts
  *    (`main_scripts/step1_tr_data_creat_ment_disamb.py:69-77`): hot blocks
  *    generate O(n²) candidate pairs, so blocks above `maxBlock` are dropped
  *    (SURVEY.md §4.2.1);
  *  - LSH blocking has no reference analogue (reference surfaces are exact
  *    dictionary hits); it is the web-scale path for typo'd surfaces.
  *
  * Scale design:
  *  - the dict join broadcasts (dict is ontology-sized, ~4k rows in the
  *    reference);
  *  - blocks and candidate pairs carry ONLY (block_key, mention_id, url):
  *    a pair sharing 16 LSH bands materializes 16 duplicate rows before
  *    dedup, so row width dominates shuffle volume — payloads (surface, ctx)
  *    are hydrated back by Scoring AFTER the pair dedup (late
  *    materialization);
  *  - pair generation is THE shuffle-heavy operator (SURVEY.md J7); blocks
  *    between `saltThreshold` and `maxBlock` use a salted self-join so one
  *    hot key spreads over `nSalts` shuffle partitions.
  */
object Blocking {

  val LshNumHashes = 64
  val LshBands = 16
  val LshRows = 4 // bands * rows == numHashes

  /** Dictionary blocks: block_key = "e:<entity_id>" for every mention whose
    * normalized surface exactly matches a dictionary key. A key shared by two
    * entities (abbreviation trap) puts the mention in both blocks — exactly
    * like the reference's multi-row containment hit
    * (`main_scripts/step0_mimic3_data_processing.py:311`). */
  def dictBlocks(mentions: DataFrame, dict: DataFrame): DataFrame = {
    val keys = dict.select(col("entity_id"), explode(col("keys")).as("norm_key"))
    mentions.join(broadcast(keys), Seq("norm_key"))
      .select(concat(lit("e:"), col("entity_id")).as("block_key"),
        col("mention_id"), col("url"))
  }

  /** LSH blocks: block_key = "l:<band>:<bandhash>" from the minhash signature
    * of the normalized surface. */
  def lshBlocks(mentions: DataFrame, seed: Long = 42L): DataFrame =
    mentions.select(
      explode(lsh_band_keys(
        minhash_sig(col("norm_key"), k = 3, numHashes = LshNumHashes, seed = seed),
        LshBands, LshRows)).as("block_key"),
      col("mention_id"), col("url"))

  def allBlocks(mentions: DataFrame, dict: DataFrame, seed: Long = 42L): DataFrame =
    dictBlocks(mentions, dict).unionByName(lshBlocks(mentions, seed))

  /** Drop blocks larger than maxBlock (stop-key rule) and attach block_size.
    * One aggregation + join back; the aggregation is map-side partial so the
    * shuffle carries only (block_key, count). */
  def capBlocks(blocks: DataFrame, maxBlock: Int): DataFrame = {
    val sizes = blocks.groupBy("block_key")
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") <= maxBlock)
    blocks.join(sizes, Seq("block_key"))
  }

  /** Capped blocks table — the blocking stage's materialization point
    * (Pipeline checkpoints it; the self-join reads it several times).
    * block_id = xxhash64(block_key): pair generation joins and dedups on the
    * NUMERIC id — string min/first aggregates force SortAggregate (string agg
    * buffers cannot hash-aggregate), which sorted the entire pre-dedup pair
    * set; a rare 64-bit collision only merges two blocks' candidates, which
    * the scorer re-separates. */
  def blocks(mentions: DataFrame, dict: DataFrame, maxBlock: Int = 1024,
      seed: Long = 42L, persist: Boolean = false): DataFrame = {
    val b = capBlocks(allBlocks(mentions, dict, seed), maxBlock)
      .withColumn("block_id", xxhash64(col("block_key")))
    if (persist) b.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else b
  }

  /** Candidate pairs within each block, url_a < url_b, exactly once per
    * (block_key, mention pair). Blocks with block_size > saltThreshold go
    * through a salted self-join: the left side gets salt = hash(url) % nSalts,
    * the right side is replicated nSalts times, and the join key is
    * (block_key, salt) — every pair appears exactly once (when the replica's
    * salt equals the left row's salt) while the hot key spreads over nSalts
    * shuffle partitions (SURVEY.md §4.2.1; property-tested:
    * pairs(salted) == pairs(plain)).
    */
  def candidatePairs(cappedBlocks: DataFrame, saltThreshold: Int = 64,
      nSalts: Int = 16): DataFrame = {
    val withId =
      if (cappedBlocks.columns.contains("block_id")) cappedBlocks
      else cappedBlocks.withColumn("block_id", xxhash64(col("block_key")))
    val cold = withId.filter(col("block_size") <= saltThreshold)
    val hot = withId.filter(col("block_size") > saltThreshold)

    def pairUp(a: DataFrame, b: DataFrame, extraKey: Seq[String]): DataFrame = {
      val la = a.select((Seq(col("block_id")) ++ extraKey.map(col) ++ Seq(
        col("mention_id").as("mid_a"), col("url").as("url_a"))): _*)
      val lb = b.select((Seq(col("block_id")) ++ extraKey.map(col) ++ Seq(
        col("mention_id").as("mid_b"), col("url").as("url_b"))): _*)
      la.join(lb, Seq("block_id") ++ extraKey)
        .filter(col("url_a") < col("url_b"))
        .drop(extraKey: _*)
    }

    val coldPairs = pairUp(cold, cold, Seq.empty)

    val hotLeft = hot.withColumn("salt",
      pmod(xxhash64(col("url")), lit(nSalts)).cast("int"))
    val hotRight = hot.withColumn("salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    val hotPairs = pairUp(hotLeft, hotRight, Seq("salt"))

    coldPairs.unionByName(hotPairs)
  }

  /** Distinct candidate mention pairs with the (deterministic, min) shared
    * block id. FULLY numeric rows: (mid_a, mid_b, block_id) — three longs.
    * The urls used for pair orientation (url_a < url_b, applied in
    * candidatePairs) are functionally dependent on the mention ids, so they
    * are DROPPED before the dedup shuffle and re-attached by
    * Scoring.hydrate: this groupBy is the single heaviest shuffle in the
    * pipeline (one row per band-duplicate candidate), and carrying ~60-char
    * url strings through it tripled its byte volume (measured at 2.4M
    * pages). mid_a always belongs to the lexicographically smaller url. */
  def pairsFromBlocks(cappedBlocks: DataFrame, saltThreshold: Int = 64,
      nSalts: Int = 16): DataFrame =
    candidatePairs(cappedBlocks, saltThreshold, nSalts)
      .select("mid_a", "mid_b", "block_id")
      .groupBy("mid_a", "mid_b")
      .agg(min(col("block_id")).as("block_id"))

  /** Full blocking stage: mentions + dict -> distinct candidate pairs.
    * Persists the intermediate blocks table across the self-join branches. */
  def pairs(mentions: DataFrame, dict: DataFrame, maxBlock: Int = 1024,
      saltThreshold: Int = 64, nSalts: Int = 16, seed: Long = 42L): DataFrame =
    pairsFromBlocks(blocks(mentions, dict, maxBlock, seed, persist = true),
      saltThreshold, nSalts)
}
