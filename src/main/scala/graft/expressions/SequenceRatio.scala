package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Ratcliff–Obershelp sequence similarity, `2*M / (|a|+|b|)` where `M` is the
  * total size of recursively-found longest matching blocks — the same measure
  * as Python's `difflib.SequenceMatcher.ratio()` (without autojunk, which
  * never triggers on the short street-name strings this engine compares;
  * reference `gs_ready.py:341-353` uses it for fuzzy device resolution with
  * threshold 0.7, `gs_ready.py:21-22`).
  *
  * Codegen emits a static call into [[SequenceRatio.ratioUTF8]], so the
  * expression participates in whole-stage codegen (no interpreted-eval
  * boundary splitting the fuzzy-join stage) while the algorithm itself stays
  * in one audited implementation. Inputs are compared case-sensitively;
  * callers normalize with `lower`/`trim` first, as the reference does
  * (`gs_ready.py:141-165`).
  */
case class SequenceRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "seq_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SequenceRatio.ratioUTF8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.SequenceRatio.ratioUTF8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object SequenceRatio {

  /** Codegen entry point: both the generated code and the interpreted eval
    * route through this single static method.
    */
  def ratioUTF8(a: UTF8String, b: UTF8String): Double = ratio(a.toString, b.toString)

  /** `difflib.SequenceMatcher(None, a, b).ratio()` semantics. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val matched = matchedSize(a.toCharArray, b.toCharArray, 0, a.length, 0, b.length)
    2.0 * matched / (a.length + b.length)
  }

  /** Total matched chars: find the longest matching block (leftmost-lowest on
    * ties, like difflib's `find_longest_match`), recurse on both sides.
    */
  private def matchedSize(
      a: Array[Char], b: Array[Char],
      aLo: Int, aHi: Int, bLo: Int, bHi: Int): Int = {
    if (aLo >= aHi || bLo >= bHi) return 0
    var bestI = aLo
    var bestJ = bLo
    var bestSize = 0
    // j2len[j] = length of the longest match ending at a[i-1], b[j-1]
    var j2len = new Array[Int](bHi - bLo + 1)
    var i = aLo
    while (i < aHi) {
      val newJ2len = new Array[Int](bHi - bLo + 1)
      var j = bLo
      while (j < bHi) {
        if (a(i) == b(j)) {
          val k = j2len(j - bLo) + 1
          newJ2len(j - bLo + 1) = k
          if (k > bestSize) { bestI = i - k + 1; bestJ = j - k + 1; bestSize = k }
        }
        j += 1
      }
      j2len = newJ2len
      i += 1
    }
    if (bestSize == 0) 0
    else
      bestSize +
        matchedSize(a, b, aLo, bestI, bLo, bestJ) +
        matchedSize(a, b, bestI + bestSize, aHi, bestJ + bestSize, bHi)
  }
}
