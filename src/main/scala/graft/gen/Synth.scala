package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.expr.HashUtil
import graft.model.{DictEntry, GoldCluster, Page}

/** Deterministic counter-based PRNG: every value is a pure function of
  * (seed, counter). Stable across JVMs/platforms (unlike java.util.Random
  * stream-splitting idioms) and splittable per row — generation parallelizes
  * and is order-independent (FIXTURES.md preamble).
  */
final class DetRng(seed: Long) {
  private var ctr = 0L
  def nextLong(): Long = { ctr += 1; HashUtil.mix(seed + ctr * 0x9e3779b97f4a7c15L) }
  def nextInt(n: Int): Int = (((nextLong() >>> 1) % n).toInt)
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

/** Synthetic-fixture parameters. Content is a pure function of (seed, sizes).
  * Defaults give the `tiny` scale used by unit/e2e tests; Bench scales up
  * nPages (FIXTURES.md §1).
  */
case class SynthParams(
    nPages: Int = 1000,
    nEntities: Int = 200,
    nHosts: Int = 50,
    seed: Long = 42L,
    corruptFraction: Double = 0.0,
    entityPageFraction: Double = 0.85,
    perturbFraction: Double = 0.5,
    dupSnapshotEvery: Int = 29)

/** Deterministic synthetic generator for `pages`, `dict`, and planted entity
  * truth (FIXTURES.md). The role of the reference's MIMIC-III notes +
  * ORDO2UMLS ontology map + gold annotation CSV, re-cast as Common-Crawl-style
  * web pages per BASELINE.json input_hint. No external data; seed 42.
  *
  * Design notes for the F1≥0.99 gate (SURVEY.md §7.4):
  *  - entity surfaces are Capitalized token runs inside lowercase filler text,
  *    so a deterministic extractor recovers them byte-identically;
  *  - perturbations are single edits on tokens ≥4 chars, keeping pairwise
  *    shingle-Jaccard high enough for LSH banding to co-block true pairs;
  *  - each entity carries an 8-word topic pool; 6 topic words flank every
  *    mention, so the context hash-embedding cosine separates the
  *    shared-abbreviation traps (identical surfaces, different entities) that
  *    string similarity alone cannot — mirroring the reference, where context
  *    BERT embeddings resolve what its rule features cannot
  *    (`main_scripts/sent_bert_emb_viz_util.py:205-262,926`);
  *  - entity popularity is skewed (u^2 draw) so hot-block capping/salting is
  *    genuinely exercised (reference analogue: the prevalence rule dropping
  *    ultra-frequent concepts, `main_scripts/step1_tr_data_creat_ment_disamb.py:69-77`).
  */
object Synth {

  private val letters = "abcdefghijklmnopqrstuvwxyz"

  private def word(rng: DetRng, minLen: Int, maxLen: Int): String = {
    val len = minLen + rng.nextInt(maxLen - minLen + 1)
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) { sb.append(letters.charAt(rng.nextInt(26))); i += 1 }
    sb.toString
  }

  /** Word pools — pure function of seed, memoized per executor. */
  private val fillerCache =
    new java.util.concurrent.ConcurrentHashMap[Long, IndexedSeq[String]]()

  def fillerWords(seed: Long): IndexedSeq[String] =
    fillerCache.computeIfAbsent(seed, { _ =>
      val rng = new DetRng(HashUtil.mix(seed ^ 0xf111e7L))
      (0 until 3000).map(_ => word(rng, 4, 8))
    })

  private def capitalize(w: String): String =
    w.substring(0, 1).toUpperCase + w.substring(1)

  /** An entity: id, canonical (Capitalized tokens), aliases, topic pool. */
  case class Entity(
      idx: Int,
      entityId: String,
      canonical: String,
      aliases: IndexedSeq[String],
      topics: IndexedSeq[String])

  /** Deterministic driver-side dictionary (reference: 4,064-row ontology map
    * loaded whole, `main_scripts/step0_mimic3_data_processing.py:292`).
    * Entities 2i/2i+1 with i%19==0 share an abbreviation alias — the "HD"
    * ambiguity trap (`main_scripts/sent_bert_emb_viz_util.py:926`). Memoized
    * per (seed, n) so executor closures rebuild it identically with no
    * broadcast needed at test scale.
    */
  private val dictCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), IndexedSeq[Entity]]()

  def entities(seed: Long, n: Int): IndexedSeq[Entity] =
    dictCache.computeIfAbsent((seed, n), { _ =>
      val base = (0 until n).map { i =>
        val rng = new DetRng(HashUtil.mix(seed ^ (0xd1c7L + i.toLong * 7919L)))
        val nTok = 3 + rng.nextInt(2) // 3-4 tokens
        val toks = (0 until nTok).map(_ => capitalize(word(rng, 5, 9)))
        val canonical = toks.mkString(" ")
        val abbrev = toks.map(_.charAt(0)).mkString // all caps initials
        val reorder = (toks.tail :+ toks.head).mkString(" ")
        val aliases = IndexedSeq(canonical, reorder, abbrev)
        val topics = (0 until 8).map(_ => word(rng, 5, 9))
        Entity(i, f"E$i%06d", canonical, aliases, topics)
      }
      // shared-abbreviation traps: entity 2i+1 adopts entity 2i's abbreviation
      base.map { e =>
        if (e.idx % 2 == 1 && (e.idx / 2) % 19 == 0 && e.idx - 1 >= 0) {
          val donor = base(e.idx - 1)
          val donorAbbrev = donor.aliases.last
          e.copy(aliases = e.aliases.dropRight(1) :+ donorAbbrev)
        } else e
      }
    })

  def dict(spark: SparkSession, p: SynthParams): Dataset[DictEntry] = {
    import spark.implicits._
    val rows = entities(p.seed, p.nEntities).map { e =>
      DictEntry(
        e.entityId,
        e.canonical,
        e.aliases.toArray,
        e.aliases.map(a => a.toLowerCase.replaceAll("[^a-z0-9]+", "")).distinct.toArray)
    }
    spark.createDataset(rows)
  }

  /** Deterministic taxonomy dimensions — the ORDO→ICD10→ICD9 chain analogue
    * (`main_scripts/rare_disease_id_util.py:278-322`): entity → category
    * (29 categories by entity index) and category → supercategory (7). Tiny
    * broadcast dims, like the reference's ontology sheets. */
  def entityCategories(spark: SparkSession, p: SynthParams): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    entities(p.seed, p.nEntities)
      .map(e => (e.entityId, f"C${e.idx % 29}%03d")).toDF("child", "parent")
  }

  def categorySupers(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until 29).map(c => (f"C$c%03d", s"S${c % 7}")).toDF("child", "parent")
  }

  /** One logical page, derived purely from (params, id). */
  private[gen] def genPage(p: SynthParams, id: Long): (Page, String) = {
    val rng = new DetRng(HashUtil.mix(p.seed ^ (id * 0x2545f4914f6cdd1dL + 0x9e37L)))
    val fillers = fillerWords(p.seed)
    val host = {
      // zipf-ish host skew
      val u = rng.nextDouble()
      (p.nHosts * u * u).toInt
    }
    val url = s"https://h$host.example/p$id"
    val ts = new Timestamp(1704067200000L + (rng.nextLong() >>> 40)) // ~2024+ spread

    val isEntity = rng.nextDouble() < p.entityPageFraction
    val lang = if (rng.nextDouble() < 0.95) "en"
      else IndexedSeq("de", "fr", "es", "zh")(rng.nextInt(4))

    val nFill = 10 + rng.nextInt(10)
    val fill = (0 until nFill).map(_ => fillers(rng.nextInt(fillers.length)))

    val (bodyTokens, entityId) = if (!isEntity) {
      (fill, null: String)
    } else {
      val ents = entities(p.seed, p.nEntities)
      val u = rng.nextDouble()
      val e = ents(math.min(p.nEntities - 1, (p.nEntities * u * u).toInt))
      // surface form: canonical 45%, reorder 30%, abbreviation 25%
      val r = rng.nextDouble()
      val raw = if (r < 0.45) e.aliases(0) else if (r < 0.75) e.aliases(1) else e.aliases(2)
      val surface =
        if (raw.length >= 8 && rng.nextDouble() < p.perturbFraction) perturb(raw, rng)
        else raw
      // 6 DISTINCT topic words flanking the mention (3 + 3): partial
      // Fisher-Yates over the entity's 8-word pool => any two pages of the
      // same entity share >= 4 topic words in their context windows
      val pool = e.topics.toArray
      var ti = 0
      while (ti < 6) {
        val j = ti + rng.nextInt(pool.length - ti)
        val tmp = pool(ti); pool(ti) = pool(j); pool(j) = tmp
        ti += 1
      }
      val t = pool.take(6).toIndexedSeq
      val cut = math.min(fill.length - 1, 3 + rng.nextInt(5))
      val toks = fill.take(cut) ++ t.take(3) ++ surface.split(" ") ++
        t.drop(3) ++ fill.drop(cut)
      (toks, e.entityId)
    }
    val text = bodyTokens.mkString(" ")
    var html = s"<html><head><title>h$host</title></head><body><p>$text</p></body></html>"
    if (p.corruptFraction > 0 && rng.nextDouble() < p.corruptFraction) {
      // flip one byte inside the body so the extraction invariant trips
      val pos = html.indexOf("<p>") + 3
      html = html.substring(0, pos) + "#" + html.substring(pos + 1)
    }
    (Page(url, ts, html.getBytes("UTF-8"), text, lang), entityId)
  }

  /** One deterministic single-character edit on a lowercase, non-initial
    * position of a token with ≥4 chars (keeps the Capitalized-run extraction
    * and token count intact). */
  private def perturb(s: String, rng: DetRng): String = {
    val toks = s.split(" ")
    val eligible = toks.indices.filter(i => toks(i).length >= 4)
    if (eligible.isEmpty) return s
    val ti = eligible(rng.nextInt(eligible.length))
    val t = toks(ti)
    val pos = 1 + rng.nextInt(t.length - 2) // in [1, len-2]
    val op = rng.nextInt(3)
    val nt = op match {
      case 0 => // swap with next char
        val a = t.toCharArray; val c = a(pos); a(pos) = a(pos + 1); a(pos + 1) = c
        new String(a)
      case 1 => // drop char
        t.substring(0, pos) + t.substring(pos + 1)
      case _ => // duplicate char
        t.substring(0, pos) + t.charAt(pos) + t.substring(pos)
    }
    toks(ti) = nt
    toks.mkString(" ")
  }

  /** Distributed pages table. Duplicate snapshots (same url, later warc_ts,
    * identical text) are planted every `dupSnapshotEvery` ids to exercise the
    * latest-wins dedup path (FIXTURES.md §1 warc_ts).
    */
  def pages(spark: SparkSession, p: SynthParams): Dataset[Page] = {
    import spark.implicits._
    spark.range(p.nPages).flatMap { id =>
      val (page, _) = genPage(p, id)
      if (p.dupSnapshotEvery > 0 && id % p.dupSnapshotEvery == 0)
        Seq(page, page.copy(warc_ts = new Timestamp(page.warc_ts.getTime + 3600000L)))
      else Seq(page)
    }
  }

  /** Planted entity truth: url -> entity cluster (null-entity filler pages
    * excluded). */
  def goldClusters(spark: SparkSession, p: SynthParams): Dataset[GoldCluster] = {
    import spark.implicits._
    spark.range(p.nPages).flatMap { id =>
      val (page, ent) = genPage(p, id)
      if (ent == null) Seq.empty[GoldCluster] else Seq(GoldCluster(page.url, ent))
    }
  }
}
