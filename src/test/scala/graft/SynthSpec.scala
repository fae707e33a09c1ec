package graft

import org.apache.spark.sql.functions._

import graft.gen.{Synth, SynthParams}
import graft.ops.Extract

/** Fixture-generator tests: determinism, extraction invariant, mention
  * recovery (SURVEY.md §5.2 / §7.2 step 1). */
class SynthSpec extends SparkSpec {
  import spark.implicits._

  private val p = SynthParams(nPages = 400, nEntities = 60)

  test("generation is deterministic: same seed => identical content hash") {
    def checksum(): java.math.BigDecimal =
      Synth.pages(spark, p).toDF()
        .select(xxhash64(col("url"), col("warc_ts"), col("html"), col("text"),
          col("lang")).cast("decimal(38,0)").as("h"))
        .agg(sum("h")).as[java.math.BigDecimal].head()
    checksum() shouldBe checksum()
  }

  test("pages conform to input_hint schema") {
    val df = Synth.pages(spark, p).toDF()
    df.schema.fieldNames.toSeq shouldBe Seq("url", "warc_ts", "html", "text", "lang")
    df.schema("url").dataType.typeName shouldBe "string"
    df.schema("warc_ts").dataType.typeName shouldBe "timestamp"
    df.schema("html").dataType.typeName shouldBe "binary"
  }

  test("extraction invariant holds on clean pages, trips on corrupted ones") {
    val clean = Extract.withInvariant(
      Extract.latestSnapshot(Synth.pages(spark, p).toDF()))
    clean.filter(!col("invariant_ok")).count() shouldBe 0L

    val corrupt = Extract.withInvariant(Extract.latestSnapshot(
      Synth.pages(spark, p.copy(corruptFraction = 0.3)).toDF()))
    val bad = corrupt.filter(!col("invariant_ok")).count()
    bad should be > 0L
    // corruption flips html only; the text column is untouched
    corrupt.count() shouldBe clean.count()
  }

  test("latest-snapshot dedup leaves one row per url") {
    val pages = Synth.pages(spark, p).toDF()
    pages.count() should be > pages.select("url").distinct().count()
    val dedup = Extract.latestSnapshot(pages)
    dedup.count() shouldBe pages.select("url").distinct().count()
  }

  test("mention extraction recovers each entity page's surface byte-identically") {
    val pages = Extract.withInvariant(
      Extract.latestSnapshot(Synth.pages(spark, p).toDF()))
    val mentions = Extract.mentions(pages)
    // every english entity page yields exactly one mention
    val truth = Synth.goldClusters(spark, p).toDF()
    val en = pages.filter(col("lang") === "en").join(truth, "url")
    mentions.join(en, "url").count() shouldBe en.count()
    // each mention surface appears verbatim in the page text
    val bad = mentions.join(pages, "url")
      .filter(!col("text").contains(col("surface"))).count()
    bad shouldBe 0L
    // and no mentions from filler pages
    val fillerMentions = mentions.join(truth, Seq("url"), "left_anti").count()
    fillerMentions shouldBe 0L
  }

  test("dictionary is deterministic and well-formed") {
    val d1 = Synth.dict(spark, p).collect().sortBy(_.entity_id)
    val d2 = Synth.dict(spark, p).collect().sortBy(_.entity_id)
    d1.map(_.canonical).toSeq shouldBe d2.map(_.canonical).toSeq
    d1.length shouldBe p.nEntities
    all(d1.map(_.keys.length)) should be >= 1
    // trap pair: entity 1 shares entity 0's abbreviation key
    val e0 = d1(0); val e1 = d1(1)
    e0.keys.toSet.intersect(e1.keys.toSet) should not be empty
  }
}
