package graft

import graft.ops.ClusterEval

/** Cluster-quality semantics: hand contingency with the pico-quantized
  * ln-term pipeline recomputed driver-side, the perfect-partition law,
  * degenerate-partition NULLs, and the centroid assignment canon.
  */
class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  private def pico(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong

  test("purityNmi: hand contingency matches the quantized pipeline exactly") {
    // clusters {1: a,a,b} {2: b,b}: purity = (2+2)/5
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b"), (2L, "b"))
      .toDF("cell", "label")
    val got = ClusterEval.purityNmi(df, "cell", "label").head()
    assert(got.getAs[Long]("n") == 5L)
    assert(got.getAs[Long]("n_clusters") == 2L && got.getAs[Long]("n_labels") == 2L)
    assert(got.getAs[Double]("purity") == 0.8)
    val n = 5.0
    val cells = Seq((3.0, 2.0, 2.0), (3.0, 3.0, 1.0), (2.0, 3.0, 2.0)) // (a_c, b_k, n_ck)
    val miP = cells.map { case (a, b, c) => pico(c / n * math.log(c * n / (a * b))) }.sum
    val hcP = Seq(3.0, 2.0).map(a => pico(-(a / n) * math.log(a / n))).sum
    val hlP = Seq(2.0, 3.0).map(b => pico(-(b / n) * math.log(b / n))).sum
    assert(got.getAs[Double]("mi") == math.floor(miP / 1e12 * 1e6 + 0.5) / 1e6)
    assert(got.getAs[Double]("h_cluster") == math.floor(hcP / 1e12 * 1e6 + 0.5) / 1e6)
    val nmi = miP.toDouble / math.sqrt(hcP.toDouble * hlP.toDouble)
    assert(got.getAs[Double]("nmi") == math.floor(nmi * 1e6 + 0.5) / 1e6)
  }

  test("purityNmi: clusters ≡ labels give purity 1 and NMI exactly 1; one cluster is NULL") {
    val perfect = ClusterEval.purityNmi(
      Seq((1L, "x"), (1L, "x"), (2L, "y"), (3L, "z")).toDF("cell", "label"),
      "cell", "label").head()
    assert(perfect.getAs[Double]("purity") == 1.0)
    // diagonal cells make each MI term equal its entropy term pre-quantization,
    // so nmi = h/√(h·h) = 1 EXACTLY in pico space
    assert(perfect.getAs[Double]("nmi") == 1.0)
    val one = ClusterEval.purityNmi(
      Seq((1L, "x"), (1L, "y")).toDF("cell", "label"), "cell", "label").head()
    assert(one.isNullAt(one.fieldIndex("nmi")), "single-cluster partition: h_cluster = 0")
  }

  test("assignCells: nearest centroid wins, rounded-cosine tie goes to the lower cell") {
    val cents = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cell", "cv")
    val vecs = Seq(
      (10L, Seq(0.9, 0.1)),   // → cell 0
      (11L, Seq(0.1, 0.9)),   // → cell 1
      (12L, Seq(0.5, 0.5)))   // exact tie → cell 0
      .toDF("id", "vec")
    val got = ClusterEval.assignCells(vecs, "vec", cents)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cell")).toMap
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }
}
