package graft

import org.apache.spark.sql.functions._

import graft.ops.Scoring

/** Scoring-stage unit tests: the rule-gated ensemble decision (reference
  * `main_scripts/evaluation_util.py:17-38`) and the hydrate join strategies. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("gatedMatch: rules agree => rule decision; disagree => model decision") {
    // (surface_a, surface_b, block_size, score)
    val rows = Seq(
      // both rules fire (long surfaces, small block): match regardless of score
      ("Alpha Beta Gamma", "Alpha Beta Gamma", 4, -10.0, true),
      // neither rule fires (short surfaces, hot block): non-match despite score
      ("AB", "AC", 999, 10.0, false),
      // disagreement (long surfaces, hot block): defer to the model
      ("Alpha Beta Gamma", "Alpha Beta Gamme", 999, 10.0, true),
      ("Alpha Beta Gamma", "Delta Epsilon Zeta", 999, -10.0, false),
      // disagreement (short surfaces, small block): defer to the model
      ("AB", "AB", 4, 10.0, true))
    val df = rows.map(r => (r._1, r._2, r._3, r._4))
      .toDF("surface_a", "surface_b", "block_size", "score")
    val out = Scoring.gatedMatch(df)
      .select("surface_a", "surface_b", "block_size", "score", "is_match")
      .collect()
    out.zip(rows).foreach { case (got, exp) =>
      withClue(s"row $exp: ") { got.getBoolean(4) shouldBe exp._5 }
    }
  }

  test("gatedMatch without block_size falls back to the length rule + model") {
    val df = Seq(("Alpha Beta Gamma", "Alpha Beta Gamma", -10.0))
      .toDF("surface_a", "surface_b", "score")
    // rulePrev defaults true, ruleLen true => both rules fire => match
    Scoring.gatedMatch(df).select("is_match").as[Boolean].head() shouldBe true
  }

  test("hydrate attaches urls+payloads; broadcast and shuffle joins agree") {
    val mentions = Seq(
      (1L, "u1", "Alpha", "ctx a"), (2L, "u2", "Beta", "ctx b"),
      (3L, "u3", "Gamma", "ctx c"))
      .toDF("mention_id", "url", "surface", "ctx")
    val pairs = Seq((1L, 2L, 7L), (1L, 3L, 7L))
      .toDF("mid_a", "mid_b", "block_id")
    val a = Scoring.hydrate(pairs, mentions, broadcastMentions = true)
      .orderBy("mid_a", "mid_b").collect()
    val b = Scoring.hydrate(pairs, mentions, broadcastMentions = false)
      .orderBy("mid_a", "mid_b").collect()
    a should contain theSameElementsAs b
    a.length shouldBe 2
    a.map(_.getAs[String]("url_b")).sorted shouldBe Array("u2", "u3")
  }

  test("topKPerKey keeps exactly k deterministic rows per key (O7 diverse cap)") {
    val df = (1 to 40).map(i => (i % 4, i.toLong)).toDF("k", "v")
    def cap() = Scoring.topKPerKey(df, Seq("k"),
      Seq(md5(concat_ws(":", col("k"), col("v"))).asc, col("v").asc), 3)
    val counts = cap().groupBy("k").count().as[(Int, Long)].collect().toMap
    counts.values.toSet shouldBe Set(3L)
    counts.keySet shouldBe Set(0, 1, 2, 3)
    // content-derived order => the kept subset is identical across runs
    cap().as[(Int, Long)].collect().toSet shouldBe cap().as[(Int, Long)].collect().toSet
    // keys smaller than k keep everything
    val small = (1 to 2).map(i => (9, i.toLong)).toDF("k", "v")
    Scoring.topKPerKey(small, Seq("k"), Seq(col("v").asc), 3).count() shouldBe 2L
  }
}
