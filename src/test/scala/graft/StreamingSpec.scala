package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.model.Page
import graft.streaming.StreamingIngest

/** Streaming ingest tests with MemoryStream (SURVEY.md §2.10: streaming is
  * an ingest adapter, not a product requirement). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def page(url: String, tsSec: Long, text: String): Page =
    Page(url, new Timestamp(tsSec * 1000),
      s"<html><head><title>t</title></head><body><p>$text</p></body></html>"
        .getBytes("UTF-8"),
      text, "en")

  test("watermarked url-dedup + invariant in a streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Page]
    val out = StreamingIngest.ingest(input.toDF(), watermark = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("ingest_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        page("u1", 1000, "alpha beta"),
        page("u1", 1000, "alpha beta"), // same-batch duplicate
        page("u2", 1010, "gamma delta"))
      query.processAllAvailable()
      val rows = spark.table("ingest_test").collect()
      rows.map(_.getAs[String]("url")).sorted shouldBe Array("u1", "u2")
      all(rows.map(_.getAs[Boolean]("invariant_ok"))) shouldBe true
      // duplicate u1 arriving within the watermark window is dropped
      input.addData(page("u1", 1100, "alpha beta"))
      query.processAllAvailable()
      spark.table("ingest_test")
        .filter($"url" === "u1").count() shouldBe 1L
    } finally query.stop()
  }
}
