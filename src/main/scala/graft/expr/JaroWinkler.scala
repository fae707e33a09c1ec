package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity.
  *
  * Spark 4.1 has no built-in Jaro-Winkler, so this is a custom Catalyst
  * `Expression` (SURVEY.md §2.8/§7.3). It is the Spark-native analogue of the
  * reference's string-similarity component of its mention↔concept scorer
  * (the reference scores candidate links with a learned model over contextual
  * features, `main_scripts/sent_bert_emb_viz_util.py:809-812`; we add classic
  * string-similarity features the same ensemble-of-signals way,
  * `main_scripts/evaluation_util.py:17-38`).
  *
  * Standard Jaro similarity with the Winkler common-prefix boost
  * (p=0.1, max prefix 4, applied only when the Jaro base exceeds the 0.7
  * boost threshold — Winkler's original formulation, and the variant DuckDB
  * implements, which is what lets the q33 oracle row cross-check this
  * kernel against an independent engine). Deterministic, null-intolerant,
  * codegen'd via a static method call so it stays inside whole-stage
  * codegen.
  */
object JaroWinkler {
  /** Codegen entry point: called from generated Java. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    compute(a.toString, b.toString)

  def compute(a: String, b: String): Double = {
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val matchDist = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val start = math.max(0, i - matchDist)
      val end = math.min(i + matchDist + 1, lb)
      var j = start
      var found = false
      while (j < end && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true
          bMatched(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - transpositions / 2.0) / m) / 3.0
    // Winkler prefix boost — only above the 0.7 boost threshold (Winkler's
    // original rule): below it the pair is already a non-match and boosting
    // noise-level scores only helps all-noise pairs toward the decision
    // threshold (exactly the failure class the affirmative-signal gate in
    // Scoring exists for)
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
