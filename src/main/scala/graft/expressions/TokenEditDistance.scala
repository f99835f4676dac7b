package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Levenshtein edit distance between two TOKEN arrays (`array<string>`) —
  * the distance TER (translation edit rate, Snover et al. 2006) is defined
  * over: Spark's builtin `levenshtein` works on characters, which
  * over-penalizes word substitutions by their spelling length. Null
  * elements compare equal to each other (the [[LcsLength]] convention).
  *
  * Same two-row DP/codegen shape as [[LcsLength]]: O(|a|·|b|) time,
  * O(min) space, static-call codegen.
  */
case class TokenEditDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_edit_distance expects two array<string> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_edit_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenEditDistance.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TokenEditDistance.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object TokenEditDistance {

  /** Codegen entry point; shorter array on the inner dimension. */
  def dist(a: ArrayData, b: ArrayData): Int = {
    val (outer, inner) = if (a.numElements() >= b.numElements()) (a, b) else (b, a)
    val n = outer.numElements()
    val m = inner.numElements()
    if (m == 0) return n
    val innerToks = new Array[UTF8String](m)
    var t = 0
    while (t < m) {
      innerToks(t) = if (inner.isNullAt(t)) null else inner.getUTF8String(t)
      t += 1
    }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j0 = 0
    while (j0 <= m) { prev(j0) = j0; j0 += 1 }
    var i = 0
    while (i < n) {
      cur(0) = i + 1
      val oi = if (outer.isNullAt(i)) null else outer.getUTF8String(i)
      var j = 0
      while (j < m) {
        val ij = innerToks(j)
        val same = (oi == null && ij == null) || (oi != null && oi.equals(ij))
        val sub = prev(j) + (if (same) 0 else 1)
        val del = prev(j + 1) + 1
        val ins = cur(j) + 1
        cur(j + 1) = math.min(sub, math.min(del, ins))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }
}
