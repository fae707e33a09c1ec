package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expr._

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * for SQL use, so `spark.sql("SELECT jaro_winkler(a, b) ...")` works on any
  * session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * No custom optimizer Rule or SparkStrategy is registered — every plan shape
  * this engine needs is standard Catalyst (SURVEY.md §4.2.3); the extension
  * surface is functions only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be a long literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]."),
      (args: Seq[Expression]) => JaroWinklerExpr(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text[, k, numHashes, seed]) - MinHash signature."),
      (args: Seq[Expression]) => MinHashSigExpr(args.head,
        if (args.length > 1) intArg(args(1), "k") else 3,
        if (args.length > 2) intArg(args(2), "numHashes") else 64,
        if (args.length > 3) longArg(args(3), "seed") else 42L)))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text[, seed]) - 64-bit SimHash over tokens."),
      (args: Seq[Expression]) => SimHash64Expr(args.head,
        if (args.length > 1) longArg(args(1), "seed") else 42L)))

    ext.injectFunction((FunctionIdentifier("hash_embed"),
      info("hash_embed", "hash_embed(text[, dim, seed]) - deterministic hash embedding."),
      (args: Seq[Expression]) => HashEmbedExpr(args.head,
        if (args.length > 1) intArg(args(1), "dim") else 256,
        if (args.length > 2) longArg(args(2), "seed") else 42L)))

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of float arrays."),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))))
  }
}

/** Imperative registration for sessions that already exist (tests, REPL). */
object GraftExtensions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    put("jaro_winkler", args => JaroWinklerExpr(args(0), args(1)))
    put("minhash_sig", args => MinHashSigExpr(args.head, 3, 64, 42L))
    put("simhash64", args => SimHash64Expr(args.head, 42L))
    put("hash_embed", args => HashEmbedExpr(args.head, 256, 42L))
    put("cosine_sim", args => CosineSimExpr(args(0), args(1)))
  }
}
