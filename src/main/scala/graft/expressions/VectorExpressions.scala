package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused, whole-stage-codegen'd vector math over `array<double>` columns.
  *
  * The engine's similarity operators (ANN brute force / LSH / IVF, embedding
  * near-dup, SemDeDup, PQ ADC, JL projection) were originally composed from
  * `zip_with` + `aggregate` higher-order functions. Those are semantically
  * right but execute as `CodegenFallback`: every row leaves generated code,
  * binds a lambda variable per element, and `zip_with` materializes an
  * intermediate product array — at a billion 768-dim embeddings that is an
  * interpreted 768-step fold plus one garbage array per row per pair. These
  * expressions compute the same values in one primitive loop over the
  * `ArrayData` (no boxing on the fast path, no intermediate array) and emit
  * a plain static call from `doGenCode`, so the enclosing projection stays
  * inside `WholeStageCodegen`.
  *
  * Null semantics replicate the higher-order forms BIT-FOR-BIT — the DuckDB
  * oracles evaluate the same list-fold SQL, and the specs pin equivalence
  * against the original column expressions:
  *
  *   - `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +)`: null if either
  *     array is null, lengths differ (`zip_with` pads with null), or any
  *     element is null; else the left-to-right fold.
  *   - accumulation order is identical (`s += ...` == the sequential fold),
  *     so IEEE-754 results are exactly the HOF values, not merely close.
  *
  * Reference analog: none (training-data extension; the reference engine has
  * no vector columns).
  */
object VectorExpressions {

  /** `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)`. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, +)`. */
  def sqdist(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** `aggregate(a, 0.0, (acc,x) => acc + x*x)` — null on null array or any
    * null element; else the sequential sum of squares.
    */
  private def sumSq(a: ArrayData): java.lang.Double = {
    if (a == null) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** `sqrt(aggregate(a, 0.0, (acc,x) => acc + x*x))`. */
  def l2norm(a: ArrayData): java.lang.Double = {
    val s = sumSq(a)
    if (s == null) null else java.lang.Double.valueOf(math.sqrt(s.doubleValue()))
  }

  /** The full cosine composite
    * `when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))` with
    * `dot`/`na`/`nb` as above — including its three-valued-logic corners
    * (a null dot still yields 0.0 when a KNOWN norm is zero, because the
    * `when` branch wins before the division is reached).
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a != null && b != null) {
      val n = a.numElements()
      if (b.numElements() == n) {
        var dt = 0.0
        var na2 = 0.0
        var nb2 = 0.0
        var i = 0
        var clean = true
        while (clean && i < n) {
          if (a.isNullAt(i) || b.isNullAt(i)) clean = false
          else {
            val x = a.getDouble(i)
            val y = b.getDouble(i)
            dt += x * y
            na2 += x * x
            nb2 += y * y
            i += 1
          }
        }
        if (clean) {
          val na = math.sqrt(na2)
          val nb = math.sqrt(nb2)
          return if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
          else java.lang.Double.valueOf(dt / (na * nb))
        }
      }
    }
    // General path: null arrays, null elements, or unequal lengths — follow
    // the composite's three-valued logic exactly.
    val d = dot(a, b)
    val na = l2norm(a)
    val nb = l2norm(b)
    if ((na != null && na.doubleValue() == 0.0) ||
      (nb != null && nb.doubleValue() == 0.0)) return java.lang.Double.valueOf(0.0)
    if (d == null || na == null || nb == null) return null
    java.lang.Double.valueOf(d.doubleValue() / (na.doubleValue() * nb.doubleValue()))
  }

  /** `aggregate(f, bias, (acc, s) => acc + element_at(w, s.bucket + 1) * s.x)`
    * — null array or any null element/field yields null (the fold's `acc`
    * goes null and stays null); otherwise the sequential sum starting at
    * `bias`. An out-of-range bucket throws (the ANSI `element_at` contract).
    */
  def weightedBucketSum(
      a: ArrayData,
      w: Array[Double],
      bias: Double,
      bucketIsLong: Boolean): java.lang.Double = {
    if (a == null) return null
    val n = a.numElements()
    var s = bias
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val st = a.getStruct(i, 2)
      if (st.isNullAt(0) || st.isNullAt(1)) return null
      val bucket = if (bucketIsLong) st.getLong(0).toInt else st.getInt(0)
      s += w(bucket) * st.getDouble(1)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** `when(norm === 0, a).otherwise(transform(a, x => x / norm))` — unit-
    * normalize, passing zero vectors (and the empty array) through unchanged.
    * A null element makes `norm` null, so the `otherwise` branch divides
    * every element by null: the result is an all-null array of the same
    * length, exactly as the HOF composite produces.
    */
  def l2normalize(a: ArrayData): ArrayData = {
    if (a == null) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return new GenericArrayData(new Array[Any](n))
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Any](n)
    var j = 0
    if (norm == 0.0) {
      while (j < n) { out(j) = a.getDouble(j); j += 1 }
    } else {
      while (j < n) { out(j) = a.getDouble(j) / norm; j += 1 }
    }
    new GenericArrayData(out)
  }
}

/** Shared shape for the binary double-valued vector expressions: custom
  * `eval`/`doGenCode` (NOT the null-intolerant `BinaryExpression` defaults)
  * because null propagation here is data-dependent — see the helper docs.
  */
abstract class BinaryVectorExpression extends BinaryExpression {

  /** Static method name on [[VectorExpressions]] — the single audited
    * implementation both eval paths route through.
    */
  protected def helper: String

  protected def compute(a: ArrayData, b: ArrayData): java.lang.Double

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def eval(input: InternalRow): Any =
    compute(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val res = ctx.freshName("vecRes")
    ev.copy(code =
      code"""
         |${l.code}
         |${r.code}
         |java.lang.Double $res = graft.expressions.VectorExpressions.$helper(
         |  ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
         |boolean ${ev.isNull} = $res == null;
         |double ${ev.value} = ${ev.isNull} ? 0.0 : $res.doubleValue();
       """.stripMargin)
  }
}

/** Dot product with `aggregate(zip_with(...))` fold semantics. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vec_dot"
  override protected def helper: String = "dot"
  override protected def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorExpressions.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared Euclidean distance (PQ ADC distances). */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vec_sqdist"
  override protected def helper: String = "sqdist"
  override protected def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorExpressions.sqdist(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity — dot and both norms in one loop. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "vec_cosine"
  override protected def helper: String = "cosine"
  override protected def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorExpressions.cosine(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a vector: `sqrt(aggregate(a, 0.0, acc + x*x))`. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any =
    VectorExpressions.l2norm(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val res = ctx.freshName("vecRes")
    ev.copy(code =
      code"""
         |${c.code}
         |java.lang.Double $res = graft.expressions.VectorExpressions.l2norm(
         |  ${c.isNull} ? null : ${c.value});
         |boolean ${ev.isNull} = $res == null;
         |double ${ev.value} = ${ev.isNull} ? 0.0 : $res.doubleValue();
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Linear-model margin over sparse hashed features:
  * `bias + Σ weights(bucket) · x`, folded left-to-right over an
  * `array<struct<bucket, x>>` column — the fused twin of
  * `aggregate(f, bias, (acc, s) => acc + element_at(w, s.bucket + 1) * s.x)`
  * (identical accumulation order, so margins are bit-identical). One fused
  * loop per document instead of an interpreted per-element fold — this is
  * the scoring path a trained LR quality filter runs over every document of
  * a 100 TB corpus. A bucket outside `weights` fails loudly
  * (IndexOutOfBounds), matching the ANSI `element_at` the HOF form uses.
  *
  * `weights` is a Seq (value equality — a raw Array would break expression
  * canonicalization) materialized once per task as a primitive array.
  */
case class WeightedBucketSum(child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "weighted_bucket_sum"

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
        if s.length == 2 &&
          (s(0).dataType == org.apache.spark.sql.types.LongType ||
            s(0).dataType == org.apache.spark.sql.types.IntegerType) &&
          s(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<bucket:long|int, x:double>>, got ${other.simpleString}")
  }

  @transient private lazy val bucketIsLong: Boolean = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _) =>
      s(0).dataType == org.apache.spark.sql.types.LongType
    case _ => true
  }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input).asInstanceOf[ArrayData]
    VectorExpressions.weightedBucketSum(a, wArr, bias, bucketIsLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val res = ctx.freshName("wbsRes")
    val wRef = ctx.addReferenceObj("wbsWeights", wArr, "double[]")
    ev.copy(code =
      code"""
         |${c.code}
         |java.lang.Double $res = graft.expressions.VectorExpressions.weightedBucketSum(
         |  ${c.isNull} ? null : ${c.value}, $wRef, $bias, $bucketIsLong);
         |boolean ${ev.isNull} = $res == null;
         |double ${ev.value} = ${ev.isNull} ? 0.0 : $res.doubleValue();
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unit-normalize a vector, zero vectors passed through unchanged. */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any =
    VectorExpressions.l2normalize(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val res = ctx.freshName("vecRes")
    val arrayData = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code =
      code"""
         |${c.code}
         |$arrayData $res = graft.expressions.VectorExpressions.l2normalize(
         |  ${c.isNull} ? null : ${c.value});
         |boolean ${ev.isNull} = $res == null;
         |$arrayData ${ev.value} = $res;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
