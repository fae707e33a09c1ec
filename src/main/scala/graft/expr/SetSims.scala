package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact set-similarity verification kernels for the near-dup pipeline:
  * character-shingle Jaccard and word-ngram Jaccard as single codegen'd
  * expressions.
  *
  * The first implementation built the shingle sets as Spark array columns
  * (sequence+transform+substr+array_distinct+array_intersect): higher-order
  * functions are interpreted row-by-row and each full-document verification
  * allocated multi-thousand-element string arrays — 160-234s for the 5k-doc
  * near-dup queries at sf0.1. These kernels hash each shingle to a long
  * (HashUtil — same family as MinHash, so verification agrees with the
  * blocking signatures), sort two primitive arrays, and merge-count:
  * O(len·log len), no string allocation. Same queries now run in seconds.
  *
  * Jaccard here is over hashed shingles; a 64-bit collision could
  * over-count by 1/|set| — immaterial against a 0.7-0.8 threshold.
  */
object SetSims {

  /** Jaccard of the k-char-shingle hash sets of a and b. */
  def shingleJaccard(a: UTF8String, b: UTF8String, k: Int): Double =
    jaccardOf(shingleHashes(a.toString, k), shingleHashes(b.toString, k))

  /** Jaccard of the n-word-gram hash sets of a and b (whitespace tokens,
    * lowercased). */
  def wordNgramJaccard(a: UTF8String, b: UTF8String, n: Int): Double =
    jaccardOf(ngramHashes(a.toString, n), ngramHashes(b.toString, n))

  private[expr] def shingleHashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n == 0) return Array.empty
    val len = if (n < k) n else k
    val count = n - len + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      out(i) = HashUtil.hashChars(s, i, len, 42L)
      i += 1
    }
    dedupSorted(out)
  }

  private[expr] def ngramHashes(s0: String, n: Int): Array[Long] = {
    val s = s0.toLowerCase
    // token start/end offsets
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var start = -1
    val len = s.length
    while (i <= len) {
      val ws = i == len || Character.isWhitespace(s.charAt(i))
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { starts.add(start); ends.add(i); start = -1 }
      i += 1
    }
    val nTok = starts.size()
    if (nTok == 0) return Array.empty
    val grams = math.max(1, nTok - n + 1)
    val out = new Array[Long](grams)
    var g = 0
    while (g < grams) {
      // hash the chars of tokens [g, g+n) including a separator fold
      var h = HashUtil.FnvOffset
      var t = g
      val tEnd = math.min(nTok, g + n)
      while (t < tEnd) {
        var c = starts.get(t).intValue()
        val e = ends.get(t).intValue()
        while (c < e) { h = (h ^ s.charAt(c)) * HashUtil.FnvPrime; c += 1 }
        h = (h ^ 0x1f) * HashUtil.FnvPrime // token separator
        t += 1
      }
      out(g) = HashUtil.mix(h)
      g += 1
    }
    dedupSorted(out)
  }

  private def dedupSorted(a: Array[Long]): Array[Long] = {
    if (a.length <= 1) return a
    java.util.Arrays.sort(a)
    var w = 1
    var i = 1
    while (i < a.length) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }

  private def jaccardOf(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}

object SetSimsColumns {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Column form of the shingle hash set: sorted deduped longs. */
  def shingleHashesArray(s: UTF8String, k: Int): GenericArrayData =
    new GenericArrayData(SetSims.shingleHashes(s.toString, k))

  /** Column form of the word n-gram hash set. */
  def ngramHashesArray(s: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(SetSims.ngramHashes(s.toString, n))

  /** Jaccard of two SORTED deduped long arrays (merge-count, O(|a|+|b|)).
    * The pair-verification kernel when the per-document hash sets are
    * precomputed once instead of re-derived from text for every candidate
    * pair the document appears in. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}

/** Per-document k-char-shingle hash set as a sorted ARRAY<LONG> column —
  * compute once per document, verify pairs with SortedJaccardExpr. */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(t: Any): Any =
    SetSimsColumns.shingleHashesArray(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SetSimsColumns.shingleHashesArray($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document word n-gram hash set as a sorted ARRAY<LONG> column. */
case class NgramHashesExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_hashes"
  override protected def nullSafeEval(t: Any): Any =
    SetSimsColumns.ngramHashesArray(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SetSimsColumns.ngramHashesArray($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard over two precomputed sorted hash-set columns. */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetSimsColumns.jaccardSorted(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SetSimsColumns.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class ShingleJaccardExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetSims.shingleJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SetSims.shingleJaccard($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class WordNgramJaccardExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngram_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetSims.wordNgramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SetSims.wordNgramJaccard($a, $b, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
