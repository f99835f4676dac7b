package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length (in characters / code points) of the longest common prefix of two
  * strings, capped at `cap` — the per-pair LCP compare of the suffix-array
  * family ([[graft.ops.SuffixArray.crossDocRepeat]]/`longestRepeat`), fused
  * into ONE codegen'd call.
  *
  * The composite it replaces — `transform(sequence(1, m), x =>
  * substring(a, x, 1) =!= substring(b, x, 1))` + `array_position` — is
  * semantically identical but evaluates the lambda INTERPRETED (higher-order
  * functions never enter whole-stage codegen) and re-seeks each
  * `substring(a, x, 1)` from byte 0, so an m-char compare cost O(m²) byte
  * scans plus ~2m interpreted expression dispatches and an m-element array
  * materialization per pair. This walks the two byte arrays once:
  * code-point-at-a-time (UTF-8 lengths from the lead byte; all previous
  * points matched byte-for-byte, so both sides sit at the same byte offset),
  * O(min(cap, lcp+1)) with zero allocation.
  *
  * `cap <= 0` returns 0 (the old `when(m <= 0, 0)` guard, folded in).
  */
case class CommonPrefixLength(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "common_prefix_len"

  // pin the cap to LongType at analysis time: without this, an IntegerType
  // cap would ClassCastException in interpreted eval (cap.asInstanceOf[Long])
  // while silently working under codegen (Java int→long widening) — the two
  // eval paths must agree, and an implicit cast makes both exact
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, LongType)

  override protected def nullSafeEval(a: Any, b: Any, cap: Any): Any =
    CommonPrefixLength.lcpUTF8(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.expressions.CommonPrefixLength.lcpUTF8($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CommonPrefixLength {

  /** Codegen entry point — both generated code and interpreted eval route
    * through this single static method. Counts matched CODE POINTS (the
    * unit Spark's `substring` indexes by), never splitting a multi-byte
    * point: two strings equal on the first n points are byte-identical on
    * that prefix, so both walks sit at the same byte offset and the next
    * point's byte length is read off its (shared) lead byte.
    */
  def lcpUTF8(a: UTF8String, b: UTF8String, cap: Long): Long = {
    if (cap <= 0L) return 0L
    val limit = math.min(a.numBytes, b.numBytes)
    var i = 0
    var n = 0L
    while (n < cap && i < limit) {
      val w = UTF8String.numBytesForFirstByte(a.getByte(i))
      if (i + w > limit) return n // the shorter side ends inside this point
      var j = 0
      while (j < w) {
        if (a.getByte(i + j) != b.getByte(i + j)) return n
        j += 1
      }
      i += w
      n += 1L
    }
    n
  }
}
