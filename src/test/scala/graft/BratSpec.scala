package graft

import org.apache.spark.sql.functions._

import graft.ops.Extract
import graft.sources.Brat

/** brat .ann standoff sink/scan (SURVEY.md S9): render + parse round-trip. */
class BratSpec extends SparkSpec {
  import spark.implicits._

  test("toAnn renders brat lines numbered in span order") {
    val mentions = Seq(
      ("u1", "Beta Corp", 20, 29),
      ("u1", "Alpha Inc", 0, 9),
      ("u2", "Gamma", 5, 10))
      .toDF("url", "surface", "begin", "end")
    val ann = Brat.toAnn(mentions).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    ann("u1") shouldBe "T1\tMention 0 9\tAlpha Inc\nT2\tMention 20 29\tBeta Corp"
    ann("u2") shouldBe "T1\tMention 5 10\tGamma"
  }

  test("fromAnn parses back and ignores non-T lines") {
    val docs = Seq(
      ("u1", "T1\tMention 0 9\tAlpha Inc\n#comment\nA1\tNegated T1\nT2\tMention 20 29\tBeta Corp"))
      .toDF("url", "ann")
    val rows = Brat.fromAnn(docs).orderBy("begin")
      .as[(String, String, Int, Int)].collect()
    rows shouldBe Array(
      ("u1", "Alpha Inc", 0, 9),
      ("u1", "Beta Corp", 20, 29))
  }

  test("round-trip on extracted fixture mentions preserves spans") {
    val text = "alpha Gadget Prime beta Other Thing gamma"
    val html = s"<html><head><title>t</title></head><body><p>$text</p></body></html>"
    val pages = Seq(("https://h.example/p1",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      html.getBytes("UTF-8"), text, "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val mentions = Extract.mentions(Extract.withInvariant(pages))
      .select("url", "surface", "begin", "end")
    val back = Brat.fromAnn(Brat.toAnn(mentions))
    back.orderBy("begin").collect() shouldBe
      mentions.orderBy("begin").collect()
  }
}
