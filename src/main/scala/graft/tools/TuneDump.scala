package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.{GoldGen, Synth, SynthParams}
import graft.ops.{Blocking, Extract, Scoring}

/** Dev tool: dump featured candidate pairs joined with gold labels to parquet
  * for offline weight/threshold tuning on the validation split (the analogue
  * of the reference tuning p,l on its first-400 validation slice,
  * `main_scripts/step1_tr_data_creat_ment_disamb.py:41-44`).
  */
object TuneDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-tune")
    val nPages = args.lift(1).map(_.toInt).getOrElse(5000)
    val nEntities = args.lift(2).map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val p = SynthParams(nPages = nPages, nEntities = nEntities)
    val pages = Extract.withInvariant(
      Extract.latestSnapshot(Synth.pages(spark, p).toDF()))
    val mentions = Extract.mentions(pages)
    val dict = Synth.dict(spark, p).toDF()
    val pairs = Blocking.pairs(mentions, dict)
    val featured = Scoring.withFeatures(Scoring.hydrate(pairs, mentions))
    val gold = GoldGen.goldPairs(spark, p)

    featured.join(gold.select("url_a", "url_b", "gold", "split"),
        Seq("url_a", "url_b"))
      .select("url_a", "url_b", "block_id", "surface_a", "surface_b",
        "jw", "lev", "jac", "cos", "gold", "split")
      .write.mode("overwrite").parquet(out)
    println(s"wrote $out")
    spark.stop()
  }
}
