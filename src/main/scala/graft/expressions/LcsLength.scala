package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of the longest common subsequence of two token arrays
  * (`array<string>`) — the backbone of ROUGE-L (Lin 2004), where the
  * summary-evaluation statistic is LCS over TOKENS, not characters.
  * Null elements inside an array are legal and compare equal to each
  * other (SQL array semantics would make them incomparable, but a token
  * array with embedded nulls is caller error either way; matching
  * null≡null keeps the DP total instead of undefined).
  *
  * Classic two-row DP: O(|a|·|b|) time, O(min(|a|,|b|)) space, with the
  * shorter array on the inner dimension. Codegen emits a static call
  * (the [[SequenceRatio]] pattern), so the expression stays inside
  * whole-stage codegen and the algorithm lives in one audited method.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lcs_len expects two array<string> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_len"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.LcsLength.lcs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object LcsLength {

  /** Codegen entry point — interpreted eval and generated code both route
    * here. The shorter array is put on the DP's inner (row) dimension so
    * the two scratch rows are O(min(|a|,|b|)).
    */
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val (outer, inner) = if (a.numElements() >= b.numElements()) (a, b) else (b, a)
    val n = outer.numElements()
    val m = inner.numElements()
    if (m == 0) return 0
    // materialize the inner side once; outer elements stream per row
    val innerToks = new Array[UTF8String](m)
    var t = 0
    while (t < m) {
      innerToks(t) = if (inner.isNullAt(t)) null else inner.getUTF8String(t)
      t += 1
    }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val oi = if (outer.isNullAt(i)) null else outer.getUTF8String(i)
      var j = 0
      while (j < m) {
        val ij = innerToks(j)
        cur(j + 1) =
          if ((oi == null && ij == null) || (oi != null && oi.equals(ij)))
            prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }
}
