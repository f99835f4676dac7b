package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All non-overlapping match SPANS of a compile-time regex over a string
  * column, as `array<struct<start int, end int>>` in UTF-16 code units
  * (Java `Matcher.start/end` semantics — the unit [[Utf16Length]] measures,
  * NOT code points; the two differ on supplementary-plane characters).
  * The redaction-audit primitive `regexp_count`/`regexp_replace` can't
  * express: WHERE the sensitive text sits, so a reviewer can slice the
  * exact bytes and an auditor can verify the scrub touched precisely them.
  *
  * The pattern is compiled ONCE per expression instance (a plan literal —
  * the [[UnicodeNormalize]] resolve-once discipline) and shipped to
  * generated code as a reference object, so codegen'd evaluation does no
  * per-row compilation and stays inside whole-stage codegen via a static
  * call. Zero-width matches are safe: `Matcher.find` self-advances past
  * them.
  */
case class RegexSpans(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def dataType: DataType = RegexSpans.SpanArray
  override def prettyName: String = "regex_spans"

  override protected def nullSafeEval(s: Any): Any =
    RegexSpans.spans(s.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pat = ctx.addReferenceObj("pattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    defineCodeGen(ctx, ev, s => s"graft.expressions.RegexSpans.spans($s, $pat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexSpans {

  val SpanArray: ArrayType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))), containsNull = false)

  /** Codegen entry point — interpreted eval routes here too. */
  def spans(s: UTF8String, p: java.util.regex.Pattern): ArrayData = {
    val m = p.matcher(s.toString)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) buf += InternalRow(m.start(), m.end())
    new GenericArrayData(buf.toArray)
  }
}
