package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Blocking

/** Blocking unit tests: dict keys, block cap (stop-key rule), and the
  * salted self-join preserving the exact pair set (SURVEY.md §5.2). */
class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private def mentionsDf(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("url", "surface")
      .withColumn("ctx", col("surface"))
      .withColumn("norm_key", graft.functions.norm_alnum(col("surface")))
      .withColumn("mention_id", xxhash64(col("url"), col("surface")))

  private def dictDf(rows: (String, String, Seq[String])*): DataFrame =
    rows.toSeq.toDF("entity_id", "canonical", "keys")
      .withColumn("aliases", col("keys"))

  test("dictionary blocking joins normalized surfaces to exploded keys") {
    val mentions = mentionsDf(
      ("u1", "Alpha Beta"), ("u2", "alphabeta"), ("u3", "Gamma Delta"),
      ("u4", "Unknown Thing"))
    val dict = dictDf(
      ("E1", "Alpha Beta", Seq("alphabeta")),
      ("E2", "Gamma Delta", Seq("gammadelta", "gd")))
    val blocks = Blocking.dictBlocks(mentions, dict)
      .select("block_key", "url").as[(String, String)].collect().toSet
    blocks shouldBe Set(("e:E1", "u1"), ("e:E1", "u2"), ("e:E2", "u3"))
  }

  test("a key shared by two entities blocks the mention into both") {
    val mentions = mentionsDf(("u1", "HD"))
    val dict = dictDf(
      ("E1", "Huntington Disease", Seq("hd", "huntingtondisease")),
      ("E2", "Hodgkin Disease", Seq("hd", "hodgkindisease")))
    val keys = Blocking.dictBlocks(mentions, dict)
      .select("block_key").as[String].collect().toSet
    keys shouldBe Set("e:E1", "e:E2")
  }

  test("block cap drops oversized blocks (prevalence/stop-key rule)") {
    val blocks = ((1 to 10).map(i => ("big", s"u$i")) ++ Seq(("small", "u1"), ("small", "u2")))
      .toDF("block_key", "url")
      .withColumn("mention_id", xxhash64(col("url")))
    val capped = Blocking.capBlocks(blocks, maxBlock = 5)
    capped.select("block_key").distinct().as[String].collect().toSet shouldBe Set("small")
  }

  test("salted pair generation emits exactly the plain pair set, once each") {
    val blocks = ((1 to 30).map(i => ("hot", f"u$i%02d")) ++
      (1 to 5).map(i => ("cold", f"c$i%02d")))
      .toDF("block_key", "url")
      .withColumn("mention_id", xxhash64(col("url")))
      .withColumn("block_size",
        when(col("block_key") === "hot", 30).otherwise(5))

    // force the hot path with a low threshold
    val hotId = Seq(Tuple1("hot")).toDF("k")
      .select(xxhash64(col("k"))).as[Long].head()
    val salted = Blocking.candidatePairs(blocks, saltThreshold = 10, nSalts = 4)
      .select("block_id", "url_a", "url_b").as[(Long, String, String)].collect()
    // plain path for comparison
    val plain = Blocking.candidatePairs(blocks, saltThreshold = 1000, nSalts = 4)
      .select("block_id", "url_a", "url_b").as[(Long, String, String)].collect()

    salted.length shouldBe plain.length // no duplicates
    salted.toSet shouldBe plain.toSet   // same set
    salted.count(_._1 == hotId) shouldBe 30 * 29 / 2
    salted.count(_._1 != hotId) shouldBe 5 * 4 / 2
  }

  test("pairs() dedups multi-block pairs keeping min block key") {
    val mentions = mentionsDf(("a", "Alpha Beta"), ("b", "Alpha Beta"))
    val dict = dictDf(
      ("E1", "Alpha Beta", Seq("alphabeta")),
      ("E2", "Alias Clash", Seq("alphabeta")))
    // both mentions identical => same dict blocks e:E1/e:E2 AND all lsh bands
    val out = Blocking.pairs(mentions, dict, maxBlock = 100).collect()
    out.length shouldBe 1
    // the min block id is deterministic: min over xxhash64 of the shared keys
    val candidates = Blocking.blocks(mentions, dict, maxBlock = 100)
      .select("block_id").as[Long].collect()
    out.head.getAs[Long]("block_id") shouldBe candidates.min
  }
}
