package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.context_cosine

/** Dev tool: pure CPU-bound scaling probe — rules the host/harness in or out
  * of scaling measurements. Runs an embarrassingly parallel expression sum at
  * the given core count. Usage: CpuScaleProbe <cores> [rows] */
object CpuScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8")
    val rows = args.lift(1).map(_.toLong).getOrElse(3000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT
    spark.range(10000).select(sum(context_cosine(
      md5(col("id").cast("string")), md5((col("id") + 1).cast("string"))))).head()
    val t0 = System.nanoTime()
    spark.range(rows).repartition(cores.toInt * 4)
      .select(sum(context_cosine(
        concat_ws(" ", md5(col("id").cast("string")), md5((col("id") * 7).cast("string"))),
        concat_ws(" ", md5((col("id") * 3).cast("string")), md5((col("id") * 11).cast("string"))))))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"cores":$cores,"rows":$rows,"sec":$sec,"rows_per_sec":${rows / sec}}""")
    spark.stop()
  }
}
