package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Corpus scaling-law diagnostics (Zipf, Heaps) and vocabulary-grain
  * distribution divergence (KL / JSD).
  */
class ScalingLawsSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  /** Driver twin of the engine's quantize-then-sum OLS: per-point moments
    * floored to nano-units, summed as longs, closed form over the sums.
    */
  private def olsExpected(pts: Seq[(Double, Double)]): (Double, Double, Double) = {
    def q(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    val n = pts.size.toDouble
    def d(s: Long): Double = s.toDouble / 1e9
    val sx = d(pts.map(p => q(p._1)).sum)
    val sy = d(pts.map(p => q(p._2)).sum)
    val sxy = d(pts.map(p => q(p._1 * p._2)).sum)
    val sxx = d(pts.map(p => q(p._1 * p._1)).sum)
    val syy = d(pts.map(p => q(p._2 * p._2)).sum)
    val cov = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    val slope = cov / varX
    val intercept = (sy - slope * sx) / n
    val r2 = (cov * cov) / (varX * varY)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    (r6(slope), r6(intercept), r6(r2))
  }

  test("zipfFit: hand-built frequency table, exact OLS twin, partition invariance") {
    // tf: a=8, b=4, c=2, d=1 → ranks 1..4 (tf desc, token asc)
    val corpus = docs(
      1L -> "a a a a b b",
      2L -> "a a a a b b c",
      3L -> "c d")
    val row = TextAnalysis.zipfFit(corpus, "doc_id", "text").head()
    assert(row.getAs[Long]("n_types") == 4L)
    assert(row.getAs[Long]("n_tokens") == 15L)
    val pts = Seq(8L, 4L, 2L, 1L).zipWithIndex.map { case (tf, i) =>
      (math.log((i + 1).toDouble), math.log(tf.toDouble))
    }
    val (slope, intercept, r2) = olsExpected(pts)
    assert(row.getAs[Double]("slope") == slope)
    assert(row.getAs[Double]("intercept") == intercept)
    assert(row.getAs[Double]("r2") == r2)
    // perfect power law here: slope = -ln2/ln2-ish fit quality near 1
    assert(r2 > 0.95 && slope < 0)

    val repart = TextAnalysis.zipfFit(corpus.repartition(7), "doc_id", "text").head()
    assert(repart == row, "nano-unit sums must be partitioning-invariant")
  }

  test("zipfFit: minTf drops the hapax tail from the fit") {
    val corpus = docs(1L -> "a a a a b b hapax1 hapax2 hapax3")
    val all = TextAnalysis.zipfFit(corpus, "doc_id", "text").head()
    val cut = TextAnalysis.zipfFit(corpus, "doc_id", "text", minTf = 2L).head()
    assert(all.getAs[Long]("n_types") == 5L)
    assert(cut.getAs[Long]("n_types") == 2L)
    assert(cut.getAs[Long]("n_tokens") == 6L)
  }

  test("heapsLaw: hand-computed cumulative spine and OLS twin; empty docs drop") {
    // d1: N=2 V=2 | d2: N=4 V=3 | d3: N=7 V=4 (doc 4 empty → no point)
    val corpus = docs(1L -> "a b", 2L -> "a c", 3L -> "c d a", 4L -> "", 5L -> null)
    val row = TextAnalysis.heapsLaw(corpus, "doc_id", "text").head()
    assert(row.getAs[Long]("n_docs") == 3L)
    assert(row.getAs[Long]("n_tokens") == 7L)
    assert(row.getAs[Long]("n_types") == 4L)
    val pts = Seq((2L, 2L), (4L, 3L), (7L, 4L)).map { case (n, v) =>
      (math.log(n.toDouble), math.log(v.toDouble))
    }
    val (slope, interceptQ, _) = olsExpected(pts)
    assert(row.getAs[Double]("beta") == slope)
    val expectedK = math.floor(math.exp(interceptQ) * 1e6 + 0.5) / 1e6
    assert(row.getAs[Double]("k") == expectedK)
    assert(row.getAs[Double]("beta") > 0 && row.getAs[Double]("beta") < 1)

    val repart = TextAnalysis.heapsLaw(corpus.repartition(13), "doc_id", "text").head()
    assert(repart == row, "two-phase prefix sums must be partitioning-invariant")
  }

  test("heapsLaw: a duplicated corpus saturates (lower beta) vs a diverse one") {
    val dup = docs((1L to 40L).map(i => i -> "the same ten words repeat here again and again ok"): _*)
    val fresh = docs((1L to 40L).map(i =>
      i -> (0 until 10).map(j => s"tok_${i}_$j").mkString(" ")): _*)
    val bDup = TextAnalysis.heapsLaw(dup, "doc_id", "text").head().getAs[Double]("beta")
    val bFresh = TextAnalysis.heapsLaw(fresh, "doc_id", "text").head().getAs[Double]("beta")
    assert(bDup < 0.2, s"duplicated corpus should saturate, beta=$bDup")
    assert(bFresh > 0.9, s"all-fresh corpus should keep growing, beta=$bFresh")
  }

  test("distributionDivergence: identical corpora → exactly zero; symmetry laws") {
    val a = docs(1L -> "x y z x", 2L -> "y q")
    val zero = TextAnalysis.distributionDivergence(a, a, "text").head()
    assert(zero.getAs[Double]("kl_ab") == 0.0)
    assert(zero.getAs[Double]("kl_ba") == 0.0)
    assert(zero.getAs[Double]("jsd") == 0.0)

    val b = docs(3L -> "x x q r", 4L -> "r r s")
    val ab = TextAnalysis.distributionDivergence(a, b, "text").head()
    val ba = TextAnalysis.distributionDivergence(b, a, "text").head()
    assert(ab.getAs[Double]("jsd") == ba.getAs[Double]("jsd"), "JSD is symmetric")
    assert(ab.getAs[Double]("kl_ab") == ba.getAs[Double]("kl_ba"))
    assert(ab.getAs[Double]("kl_ba") == ba.getAs[Double]("kl_ab"))
    assert(ab.getAs[Long]("vocab") == 6L) // x y z q r s
    assert(ab.getAs[Long]("n_tokens_a") == 6L)
    assert(ab.getAs[Long]("n_tokens_b") == 7L)
    // JSD bounded by ln 2; disjoint-heavy corpora stay finite under smoothing
    assert(ab.getAs[Double]("jsd") > 0.0 && ab.getAs[Double]("jsd") <= math.log(2.0))
    assert(ab.getAs[Double]("kl_ab") > 0.0 && ab.getAs[Double]("kl_ba") > 0.0)
  }

  test("distributionDivergence: driver twin on a tiny example; partition invariance") {
    val a = docs(1L -> "u u v")
    val b = docs(2L -> "v w")
    val row = TextAnalysis.distributionDivergence(a, b, "text").head()
    // vocab = {u, v, w}, na = 3, nb = 2, alpha = 0.5
    val V = 3.0
    def pOf(c: Long, tot: Long) = (c.toDouble + 0.5) / (tot.toDouble + 0.5 * V)
    val pairs = Seq((2L, 0L), (1L, 1L), (0L, 1L)) // u, v, w counts in (a, b)
    def q(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val klab = r6(pairs.map { case (ca, cb) =>
      val pa = pOf(ca, 3L); val pb = pOf(cb, 2L); q(pa * math.log(pa / pb))
    }.sum.toDouble / 1e9)
    val jsd = r6(pairs.map { case (ca, cb) =>
      val pa = pOf(ca, 3L); val pb = pOf(cb, 2L); val m = (pa + pb) / 2.0
      q((pa * math.log(pa / m) + pb * math.log(pb / m)) / 2.0)
    }.sum.toDouble / 1e9)
    assert(row.getAs[Double]("kl_ab") == klab)
    assert(row.getAs[Double]("jsd") == jsd)

    val repart = TextAnalysis.distributionDivergence(
      a.repartition(5), b.repartition(3), "text").head()
    assert(repart == row)
  }
}
