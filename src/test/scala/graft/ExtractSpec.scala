package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Extract

/** Extraction-stage unit tests: per-occurrence mention spans (round-1 bug:
  * instr bound every occurrence to the first), position-derived context
  * windows, and URL canonicalization (SURVEY.md P13). */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def pageDf(text: String, url: String = "https://h.example/p1") = {
    val html = s"<html><head><title>t</title></head><body><p>$text</p></body></html>"
    Seq((url, Timestamp.valueOf("2024-01-01 00:00:00"),
      html.getBytes("UTF-8"), text, "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
  }

  test("repeated surface gets per-occurrence begin/end and distinct ids") {
    val text = "alpha Gadget Prime beta gamma delta Gadget Prime omega"
    val m = Extract.mentions(Extract.withInvariant(pageDf(text)))
      .filter($"surface" === "Gadget Prime")
      .select("begin", "end", "mention_id", "ctx")
      .orderBy("begin")
      .collect()
    m.length shouldBe 2
    m(0).getInt(0) shouldBe text.indexOf("Gadget Prime")
    m(1).getInt(0) shouldBe text.indexOf("Gadget Prime", m(0).getInt(0) + 1)
    m.foreach(r => r.getInt(1) shouldBe r.getInt(0) + "Gadget Prime".length)
    m(0).getLong(2) should not be m(1).getLong(2)
    // each occurrence's context window is centered on ITS tokens
    m(0).getString(3) should include("alpha Gadget Prime beta")
    m(1).getString(3) should include("delta Gadget Prime omega")
    m(0).getString(3) should not include "omega"
    m(1).getString(3) should not include "alpha"
  }

  test("context window clamps at text start and end") {
    val text = "Gadget Prime beta gamma"
    val m = Extract.mentions(Extract.withInvariant(pageDf(text)))
      .filter($"surface" === "Gadget Prime").select("ctx").as[String].head()
    m shouldBe "Gadget Prime beta gamma"
  }

  test("canonicalUrl collapses scheme/www/fragment/utm/trailing-slash variants") {
    val cases = Seq(
      "http://www.Example.com/A/b/" -> "https://example.com/A/b",
      "https://example.com/A/b" -> "https://example.com/A/b",
      "https://example.com/x?utm_source=tw&q=1#frag" -> "https://example.com/x?q=1",
      "https://example.com/x?utm_source=tw" -> "https://example.com/x",
      "HTTP://EXAMPLE.COM/path" -> "https://example.com/path",
      // host-only root: no path to trim
      "https://example.com" -> "https://example.com",
      // mid-query utm must not leave a dangling "&&" (round-2 advice): the
      // utm'd and utm-free variants of one page must canonicalize equal
      "https://a.com/x?q=1&utm_x=2&r=3" -> "https://a.com/x?q=1&r=3",
      "https://a.com/x?q=1&r=3" -> "https://a.com/x?q=1&r=3",
      "https://a.com/x?utm_a=1&utm_b=2" -> "https://a.com/x",
      // scheme-less/relative urls pass through UNCHANGED (round-2 advice:
      // they used to collapse to "" and dedup into one arbitrary survivor)
      "example.com/x/" -> "example.com/x/",
      "/relative/path?utm_x=1" -> "/relative/path?utm_x=1",
      "" -> "")
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), Extract.canonicalUrl(col("url")).as("canon"))
    df.collect().foreach { r =>
      val expected = cases.toMap.apply(r.getString(0))
      r.getString(1) shouldBe expected
    }
  }

  test("canonicalized + latestSnapshot merges scheme variants of one page") {
    val text = "alpha beta"
    val a = pageDf(text, "http://www.h.example/p1")
    val b = pageDf(text, "https://h.example/p1")
      .withColumn("warc_ts", lit(Timestamp.valueOf("2024-02-01 00:00:00")))
    val out = Extract.latestSnapshot(Extract.canonicalized(a.unionByName(b)))
    out.count() shouldBe 1
    out.select("url").as[String].head() shouldBe "https://h.example/p1"
  }
}
