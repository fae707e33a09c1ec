package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hash embedding of a token string (random-projection style).
  *
  * Spark-native analogue of the reference's contextual-embedding scorer: the
  * reference mean-pools BERT token vectors over a ±w token context window and
  * feeds them to a logistic regression
  * (`main_scripts/sent_bert_emb_viz_util.py:205-262,560-572,809-812`), served
  * from a separate BERT process. With zero egress we replace the model with a
  * deterministic per-token signed random projection: each token hashes to a
  * ±1 vector in `dim` dimensions; the text embedding is the L2-normalized sum.
  * Same token multiset => same vector; disjoint token sets => near-orthogonal,
  * which is exactly the property the pairwise cosine feature needs.
  *
  * This is also the "broadcast-embedding cosine" scale pattern: at 100 TB the
  * embedding is computed per-row inside codegen — no shuffle, no service call,
  * no driver-side state (vs the reference's ZeroMQ BertClient hop,
  * `main_scripts/sent_bert_emb_viz_util.py:495-513`).
  */
object HashEmbed {
  def embed(text: UTF8String, dim: Int, seed: Long): ArrayData =
    new GenericArrayData(embedArray(text.toString, dim, seed))

  def embedArray(s: String, dim: Int, seed: Long): Array[Float] = {
    val acc = new Array[Float](dim)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ' || s.charAt(i) == '\t' || s.charAt(i) == '\n') {
        if (i > start) {
          val h0 = HashUtil.hashChars(s, start, i - start, seed)
          var d = 0
          while (d < dim) {
            // one mixed hash per 64 dims; use each bit as a sign
            val word = HashUtil.mix(h0 ^ (0xda942042e4dd58b5L * ((d >> 6) + 1)))
            val sign = if (((word >>> (d & 63)) & 1L) == 1L) 1.0f else -1.0f
            acc(d) += sign
            d += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var norm = 0.0
    var d = 0
    while (d < dim) { norm += acc(d).toDouble * acc(d); d += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      d = 0
      while (d < dim) { acc(d) *= inv; d += 1 }
    }
    acc
  }
}

case class HashEmbedExpr(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_embed"

  override protected def nullSafeEval(v: Any): Any =
    HashEmbed.embed(v.asInstanceOf[UTF8String], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashEmbed.embed($c, $dim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity between two float vectors (ArrayType(FloatType)).
  *
  * Implemented as a custom Expression rather than the
  * `aggregate(zip_with(...))` built-in composition because higher-order
  * functions are not whole-stage-codegen'd; this tight loop is, via a static
  * call (SURVEY.md §2.8 "custom expression for speed"). Returns 0.0 when
  * either vector has zero norm; errors on length mismatch (schema bug, not
  * data noise).
  */
object CosineSim {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"cosine: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.CosineSim.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
