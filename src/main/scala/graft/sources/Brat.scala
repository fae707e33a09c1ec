package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** brat standoff-annotation (.ann) sink/scan — SURVEY.md S9 (reference:
  * `other_scripts/extract_mention_cw_in_cohort.py:38-65` writes
  * `T<n>\t<label> <begin> <end>\t<surface>` lines per document for the brat
  * annotation tool).
  *
  * Representation: one row per document, `(url, ann)` where `ann` is the
  * full .ann file body (annotation ids T1..Tn numbered in begin order, the
  * brat convention). A per-document FILE layout at 10^12 docs would be a
  * small-files catastrophe — the table IS the sink (write it as
  * parquet/text; any exporter that needs real .ann files materializes them
  * from this table for the handful of docs a human will look at).
  */
object Brat {

  /** Render mentions (url, surface, begin, end) into per-document .ann
    * bodies. One shuffle (the per-url window numbering annotations in span
    * order) + one aggregation. */
  def toAnn(mentions: DataFrame, label: String = "Mention"): DataFrame = {
    val w = Window.partitionBy("url").orderBy(col("begin"), col("end"), col("surface"))
    mentions
      .withColumn("tid", row_number().over(w))
      .withColumn("line", format_string("T%d\t%s %d %d\t%s",
        col("tid"), lit(label), col("begin"), col("end"), col("surface")))
      .groupBy("url")
      .agg(array_join(sort_array(collect_list(struct(col("tid"), col("line"))))
        .getField("line"), "\n").as("ann"))
  }

  /** Parse .ann bodies back to (url, surface, begin, end) rows — the scan
    * direction. Tolerates non-T lines (brat files may carry A/R/E rows),
    * mirroring the reference's skip-and-continue parsing. */
  def fromAnn(annDocs: DataFrame): DataFrame = {
    val lineRe = "^T\\d+\\t\\S+ (\\d+) (\\d+)\\t(.*)$"
    annDocs
      .select(col("url"), explode(split(col("ann"), "\n")).as("line"))
      .filter(col("line").rlike(lineRe))
      .select(col("url"),
        regexp_extract(col("line"), lineRe, 3).as("surface"),
        regexp_extract(col("line"), lineRe, 1).cast("int").as("begin"),
        regexp_extract(col("line"), lineRe, 2).cast("int").as("end"))
  }
}
