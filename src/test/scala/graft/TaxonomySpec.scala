package graft

import org.apache.spark.sql.functions._

import graft.gen.{Synth, SynthParams}
import graft.ops.{Extract, Taxonomy}

/** Multi-hop taxonomy rollup (reference UMLS→ORDO→ICD10→ICD9 chains +
  * per-document union-dedup aggregation). */
class TaxonomySpec extends SparkSpec {
  import spark.implicits._

  test("docRollup chains hops and union-dedups per document") {
    val docEnts = Seq(
      ("u1", "E1"), ("u1", "E2"), ("u1", "E2"), // duplicate link dedups
      ("u2", "E3"),
      ("u3", "E9")) // E9 has no category: contributes nothing past lvl0
      .toDF("url", "entity_id")
    val entCat = Seq(("E1", "C1"), ("E2", "C1"), ("E3", "C2"))
      .toDF("child", "parent")
    val catSuper = Seq(("C1", "S1"), ("C2", "S1")).toDF("child", "parent")

    val out = Taxonomy.docRollup(docEnts,
      Seq(entCat -> "categories", catSuper -> "supers"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getSeq[String](2), r.getSeq[String](3))).toMap

    out("u1") shouldBe ((Seq("E1", "E2"), Seq("C1"), Seq("S1")))
    out("u2") shouldBe ((Seq("E3"), Seq("C2"), Seq("S1")))
    out("u3") shouldBe ((Seq("E9"), Seq(), Seq()))
  }

  test("ontology gating = pre-filtered hop table drops gated targets") {
    // the isNotGroupOfDisorders analogue: C2 is gated out of the hop dim
    val docEnts = Seq(("u1", "E1"), ("u1", "E3")).toDF("url", "entity_id")
    val entCat = Seq(("E1", "C1"), ("E3", "C2")).toDF("child", "parent")
      .filter(col("parent") =!= "C2")
    val out = Taxonomy.docRollup(docEnts, Seq(entCat -> "categories"))
      .select("url", "categories")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    out("u1") shouldBe Seq("C1")
  }

  test("fixture rollup: every category derives from a linked entity") {
    val p = SynthParams(nPages = 600, nEntities = 120)
    val pages = Extract.withInvariant(
      Extract.latestSnapshot(Synth.pages(spark, p).toDF()))
    val mentions = Extract.mentions(pages)
    val dict = Synth.dict(spark, p).toDF()
    val hops = Seq(
      Synth.entityCategories(spark, p) -> "categories",
      Synth.categorySupers(spark) -> "supercategories")
    val out = Taxonomy.rollupFromMentions(mentions, dict, hops).persist()

    out.count() should be > 100L
    // chain integrity: categories of a doc == categories of its entities
    val entCat = Synth.entityCategories(spark, p)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bad = out.select("url", "entities", "categories").collect().filter { r =>
      val expect = r.getSeq[String](1).flatMap(entCat.get).distinct.sorted
      r.getSeq[String](2).sorted != expect
    }
    bad shouldBe empty
    out.unpersist()
  }
}
