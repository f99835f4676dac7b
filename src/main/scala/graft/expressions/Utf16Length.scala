package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of a string in UTF-16 code units — `len()` of the equivalent
  * Python/Java string, as opposed to Spark's `length()` which counts Unicode
  * code points. The two differ exactly on supplementary-plane characters
  * (emoji, rare CJK): each costs one code point but two UTF-16 units.
  *
  * This is the measure [[SequenceRatio]]'s denominator is defined over
  * (difflib ratios are over Python string items = UTF-16-ish code points in
  * CPython's abstract sequence — the engine's implementation walks Java
  * `char`s), so any LENGTH-based bound on a `seq_ratio` comparison must be
  * computed in the same units to be exact —
  * [[graft.plans.SequenceRatioLengthBound]] builds difflib's
  * `real_quick_ratio` upper bound from this expression. Counted directly
  * from the UTF-8 bytes (code points + one extra per 4-byte sequence), no
  * String materialization.
  */
case class Utf16Length(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "utf16_length"

  override protected def nullSafeEval(s: Any): Any =
    Utf16Length.lengthUTF8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.Utf16Length.lengthUTF8($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Utf16Length {

  /** UTF-16 unit count: one unit per code point, plus one more for each
    * 4-byte (supplementary-plane) sequence. The fast path walks the UTF-8
    * bytes with FULL well-formedness checks (continuation count and range,
    * overlong, surrogate, > U+10FFFF); the moment anything is malformed it
    * falls back to `s.toString.length`, so the result is ALWAYS exactly the
    * Java string length [[SequenceRatio]] computes over — the exactness the
    * optimizer bound depends on. Valid UTF-8 (everything Spark produces
    * from parquet/JSON/literals) never leaves the allocation-free path.
    */
  def lengthUTF8(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var units = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b < 0x80) { units += 1; i += 1 }
      else if (b < 0xC2) return s.toString.length // stray continuation / overlong C0-C1
      else if (b < 0xE0) {
        if (i + 1 >= n || !cont(s, i + 1)) return s.toString.length
        units += 1; i += 2
      } else if (b < 0xF0) {
        if (i + 2 >= n || !cont(s, i + 1) || !cont(s, i + 2)) return s.toString.length
        val b1 = s.getByte(i + 1) & 0xFF
        if (b == 0xE0 && b1 < 0xA0) return s.toString.length // overlong
        if (b == 0xED && b1 >= 0xA0) return s.toString.length // UTF-16 surrogate range
        units += 1; i += 3
      } else if (b < 0xF5) {
        if (i + 3 >= n || !cont(s, i + 1) || !cont(s, i + 2) || !cont(s, i + 3))
          return s.toString.length
        val b1 = s.getByte(i + 1) & 0xFF
        if (b == 0xF0 && b1 < 0x90) return s.toString.length // overlong
        if (b == 0xF4 && b1 > 0x8F) return s.toString.length // > U+10FFFF
        units += 2; i += 4
      } else return s.toString.length // F5-FF: never valid leads
    }
    units
  }

  @inline private def cont(s: UTF8String, i: Int): Boolean =
    (s.getByte(i) & 0xC0) == 0x80
}
