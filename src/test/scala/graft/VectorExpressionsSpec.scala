package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.{CosineSimilarity, DotProduct, L2Norm, L2Normalize, SquaredDistance, VectorExpressions}
import graft.ops.SimilaritySearch

/** The fused vector expressions must be BIT-IDENTICAL to the
  * `zip_with`/`aggregate` higher-order composites they replace — same
  * left-to-right IEEE accumulation, same data-dependent null propagation
  * (null array, null element, unequal lengths, zero norms). The HOF columns
  * here are the executable specification; the DuckDB oracles evaluate the
  * same folds, so equivalence with the HOF form IS oracle compatibility.
  */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val hofDot: (Column, Column) => Column = (a, b) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private val hofSqDist: (Column, Column) => Column = (a, b) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  private val hofNorm: Column => Column = a =>
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  private val hofNormalize: Column => Column = a => {
    val n = hofNorm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }

  /** Deterministic adversarial vector pairs: dims 0–8, magnitudes 1e-3–1e3,
    * negatives, exact zeros, zero vectors, null arrays, null elements,
    * unequal lengths.
    */
  private def fixtures: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = {
    def d(x: Double): java.lang.Double = java.lang.Double.valueOf(x)
    val rnd = new scala.util.Random(42)
    val random = (0 until 60).map { i =>
      val na = rnd.nextInt(9)
      val nb = if (i % 5 == 0) rnd.nextInt(9) else na
      val mk = (n: Int) => Seq.tabulate(n) { _ =>
        val v = (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(7) - 3)
        d(if (rnd.nextInt(10) == 0) 0.0 else v)
      }
      (mk(na), mk(nb))
    }
    val edges: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
      (Seq(d(1), d(2)), Seq(d(3), d(4))),
      (Seq(d(0), d(0)), Seq(d(1), d(2))),     // zero-norm left → cosine 0.0
      (Seq(d(1), d(2)), Seq(d(0), d(0))),     // zero-norm right
      (Seq(d(0), d(0)), Seq(d(0), d(0))),
      (Seq.empty, Seq.empty),                  // empty arrays: norms 0 → 0.0
      (Seq(d(1)), Seq.empty),                  // unequal lengths → null dot
      (null, Seq(d(1), d(2))),                 // null array
      (Seq(d(1), d(2)), null),
      (null, null),
      (null, Seq(d(0), d(0))),                 // null left, ZERO right norm → 0.0
      (Seq(d(1), null, d(3)), Seq(d(1), d(2), d(3))),   // null element
      (Seq(d(1), d(2), d(3)), Seq(d(1), null, d(3))),
      (Seq(d(1e300), d(1e300)), Seq(d(1e300), d(1e300))), // overflow → Inf/NaN
      (Seq(d(1), d(2), d(3)), Seq(d(1), d(2))))           // length mismatch
    random ++ edges
  }

  private def pairDf: DataFrame =
    fixtures.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .repartition(3)

  private def bitsEqual(x: Any, y: Any): Boolean = (x, y) match {
    case (null, null) => true
    case (xa: Double, ya: Double) =>
      java.lang.Double.doubleToLongBits(xa) == java.lang.Double.doubleToLongBits(ya)
    case (xs: scala.collection.Seq[_], ys: scala.collection.Seq[_]) =>
      xs.length == ys.length && xs.zip(ys).forall { case (p, q) => bitsEqual(p, q) }
    case _ => false
  }

  private def assertColumnsEqual(df: DataFrame, fused: Column, hof: Column): Unit = {
    val rows = df.select(col("i"), fused.as("f"), hof.as("h")).collect()
    rows.foreach { r =>
      assert(bitsEqual(r.get(1), r.get(2)),
        s"row i=${r.getInt(0)}: fused=${r.get(1)} hof=${r.get(2)}")
    }
    assert(rows.nonEmpty)
  }

  test("vecDot ≡ aggregate(zip_with(*)) bit-for-bit on adversarial fixtures") {
    assertColumnsEqual(pairDf, Functions.vecDot(col("a"), col("b")), hofDot(col("a"), col("b")))
  }

  test("vecSqDist ≡ HOF squared distance bit-for-bit") {
    assertColumnsEqual(pairDf, Functions.vecSqDist(col("a"), col("b")), hofSqDist(col("a"), col("b")))
  }

  test("vecNorm ≡ sqrt(aggregate(x*x)) bit-for-bit") {
    assertColumnsEqual(pairDf, Functions.vecNorm(col("a")), hofNorm(col("a")))
  }

  test("vecCosine ≡ the full when/otherwise HOF composite bit-for-bit") {
    assertColumnsEqual(pairDf,
      Functions.vecCosine(col("a"), col("b")),
      SimilaritySearch.cosineHof(col("a"), col("b")))
  }

  test("vecNormalize ≡ when(norm=0, v).otherwise(transform(x/norm)) bit-for-bit") {
    assertColumnsEqual(pairDf, Functions.vecNormalize(col("a")), hofNormalize(col("a")))
  }

  test("interpreted eval path matches codegen (direct Expression.eval on literals)") {
    val at = ArrayType(DoubleType)
    def litArr(v: Seq[java.lang.Double]): Literal =
      if (v == null) Literal.create(null, at)
      else Literal.create(v.map(x => if (x == null) null else x.doubleValue()), at)
    fixtures.foreach { case (a, b) =>
      val interp = CosineSimilarity(litArr(a), litArr(b)).eval(null)
      val direct = VectorExpressions.cosine(
        if (a == null) null
        else ArrayData.toArrayData(a.map(x => if (x == null) null else x.doubleValue()).toArray),
        if (b == null) null
        else ArrayData.toArrayData(b.map(x => if (x == null) null else x.doubleValue()).toArray))
      assert(bitsEqual(
        if (interp == null) null else interp.asInstanceOf[Double],
        if (direct == null) null else direct.doubleValue()),
        s"a=$a b=$b interp=$interp direct=$direct")
      val dotI = DotProduct(litArr(a), litArr(b)).eval(null)
      val sqI = SquaredDistance(litArr(a), litArr(b)).eval(null)
      val nI = L2Norm(litArr(a)).eval(null)
      val normI = L2Normalize(litArr(a)).eval(null)
      assert(dotI == null || dotI.isInstanceOf[java.lang.Double])
      assert(sqI == null || sqI.isInstanceOf[java.lang.Double])
      assert(nI == null || nI.isInstanceOf[java.lang.Double])
      assert(normI == null || normI.isInstanceOf[ArrayData])
    }
  }

  test("WeightedBucketSum ≡ the aggregate fold bit-for-bit (incl. empty + null element)") {
    val w = Array(0.25, -1.5, 3.0, 0.0625)
    val b0 = 0.125
    val rows = Seq(
      (0, Seq((0L, 2.0), (2L, 1.0), (3L, 4.0))),
      (1, Seq((1L, 0.5))),
      (2, Seq.empty[(Long, Double)]),
      (3, Seq((0L, 1e-3), (1L, 1e3), (2L, -7.25), (3L, 0.0))))
    val df = rows.toDF("i", "raw")
      .select(col("i"),
        transform(col("raw"), s =>
          struct(s.getField("_1").as("bucket"), s.getField("_2").as("_x"))).as("_f"))
    val fusedCol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WeightedBucketSum(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("_f")),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(w), b0))
    val hofCol = aggregate(col("_f"), lit(b0),
      (acc, s) => acc +
        element_at(array(w.map(lit).toSeq: _*), s.getField("bucket").cast("int") + 1) *
          s.getField("_x"))
    assertColumnsEqual(df, fusedCol, hofCol)
    // null element in the feature array → null margin, both forms
    val withNull = df.withColumn("_f",
      when(col("i") === 1, lit(null).cast("array<struct<bucket:bigint,_x:double>>"))
        .otherwise(col("_f")))
    assertColumnsEqual(withNull, fusedCol, hofCol)
  }

  test("SQL registration: vec_cosine(a, b) usable from spark.sql") {
    Functions.register(spark)
    pairDf.createOrReplaceTempView("vec_pairs")
    val viaSql = spark.sql(
      "SELECT i, vec_cosine(a, b) AS c FROM vec_pairs ORDER BY i").collect()
    val viaCol = pairDf.select(col("i"), Functions.vecCosine(col("a"), col("b")).as("c"))
      .orderBy("i").collect()
    viaSql.zip(viaCol).foreach { case (s, c) => assert(bitsEqual(s.get(1), c.get(1))) }
  }

  private def projectInsideWholeStageCodegen(df: DataFrame): Boolean = {
    df.collect()
    var found = false
    df.queryExecution.executedPlan.foreach {
      case w: WholeStageCodegenExec =>
        w.foreach { case _: ProjectExec => found = true; case _ => () }
      case _ => ()
    }
    found
  }

  test("fused cosine projection stays inside WholeStageCodegen; the HOF form falls out") {
    val df = spark.read.parquet(sf("embeddings"))
    val q = array(Seq.fill(8)(lit(0.1)): _*)
    val fused = df.select(
      Functions.vecCosine(col("embedding").cast("array<double>"), q).as("c"))
    val hof = df.select(
      SimilaritySearch.cosineHof(col("embedding").cast("array<double>"), q).as("c"))
    assert(projectInsideWholeStageCodegen(fused),
      "fused vector projection must compile into WholeStageCodegen")
    assert(!projectInsideWholeStageCodegen(hof),
      "HOF twin unexpectedly codegen'd — the fused expression may no longer be needed")
  }

  test("brute-force top-k result unchanged by the fused expression (vs HOF recomputation)") {
    val df = spark.read.parquet(sf("embeddings"))
    val dims = df.select(size(col("embedding"))).first().getInt(0)
    val query = Seq.tabulate(dims)(i => 0.05 * (i % 7) - 0.1)
    val got = SimilaritySearch.bruteForceTopK(df, "vec_id", "embedding", query, 10).collect()
    val qc = array(query.map(lit): _*)
    val want = df.select(col("vec_id"),
        Functions.roundHalfUp(
          SimilaritySearch.cosineHof(col("embedding").cast("array<double>"), qc), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10).collect()
    assert(got.map(r => (r.get(0), r.getDouble(1))).toSeq ==
      want.map(r => (r.get(0), r.getDouble(1))).toSeq)
  }
}
