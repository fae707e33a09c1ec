package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Helper for RegexpMatchPosExpr — shared by interpreted eval and codegen. */
object RegexpMatchPos {
  /** All non-overlapping matches with their start offsets (UTF-16 code
    * units, which equal character offsets for BMP text). */
  def matches(text: UTF8String, p: Pattern): GenericArrayData = {
    val s = text.toString
    val m = p.matcher(s)
    val rows = new java.util.ArrayList[Any]()
    while (m.find()) {
      rows.add(InternalRow(UTF8String.fromString(m.group()),
        java.lang.Integer.valueOf(m.start())))
    }
    new GenericArrayData(rows.toArray)
  }
}

/** Position-aware regexp extract-all: every non-overlapping match of a
  * CONSTANT pattern together with its character offset, as
  * `array<struct<m: string, pos: int>>`.
  *
  * Spark's built-in `regexp_extract_all` loses match positions, so a repeated
  * surface on one page would be assigned the FIRST occurrence's offset by an
  * `instr`-based recovery (the round-1 span bug; SURVEY.md P11) — this
  * expression is the proper per-occurrence primitive. Reference analogue:
  * the per-annotation start/end offsets the reference reads from SemEHR JSON
  * (`main_scripts/step0_mimic3_data_processing.py:163-181`).
  */
case class RegexpMatchPosExpr(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled = Pattern.compile(pattern)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("m", StringType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "regexp_match_pos"

  override protected def nullSafeEval(t: Any): Any =
    RegexpMatchPos.matches(t.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
    defineCodeGen(ctx, ev, c => s"graft.expr.RegexpMatchPos.matches($c, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
