package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantize

/** Int8 scalar quantization: bound fitting, range, reconstruction error,
  * clamping, and degenerate dimensions.
  */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("roundtrip error bounded by half a step; q spans [-128, 127]; constants quantize to 0") {
    val vecs = Seq(
      (1L, Seq(0.0, -1.0, 5.0, 7.0)),
      (2L, Seq(1.0, 1.0, 5.0, -3.0)),
      (3L, Seq(0.5, 3.0, 5.0, 2.0))) // dim 2 is constant (hi == lo)
      .toDF("id", "v")
    val (lo, hi) = Quantize.fitBounds(vecs, "v")
    assert(lo == Seq(0.0, -1.0, 5.0, -3.0) && hi == Seq(1.0, 3.0, 5.0, 7.0))

    val got = vecs.select(
        col("id"),
        Quantize.quantize(col("v"), lo, hi).as("q"),
        Quantize.dequantize(Quantize.quantize(col("v"), lo, hi), lo, hi).as("d"))
      .as[(Long, Seq[Int], Seq[Double])].collect().sortBy(_._1)

    val orig = vecs.as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2)
    got.zip(orig).foreach { case ((id, q, d), x) =>
      assert(q.forall(v => v >= -128 && v <= 127), s"row $id out of int8 range: $q")
      x.indices.foreach { i =>
        val step = (hi(i) - lo(i)) / 255.0
        assert(math.abs(d(i) - x(i)) <= step / 2 + 1e-12,
          s"row $id dim $i: |${d(i)} - ${x(i)}| > half-step $step")
      }
    }
    // extremes hit the rails; the constant dimension quantizes to 0 and
    // dequantizes to its constant
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(1L)._2(0) == -128 && byId(2L)._2(0) == 127)
    assert(got.forall(_._2(2) == 0) && got.forall(_._3(2) == 5.0))
  }

  test("ANN over dequantized int8 vectors keeps high top-k recall") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val (lo, hi) = Quantize.fitBounds(emb, "embedding")
    val queryVec = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

    val exact = graft.ops.SimilaritySearch
      .bruteForceTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", queryVec, 20)
      .select("vec_id").as[Long].collect().toSet
    // search the 4x-smaller int8 corpus through the same operator
    val dq = emb.select(
      col("vec_id"),
      Quantize.dequantize(Quantize.quantize(col("embedding"), lo, hi), lo, hi).as("emb_q"))
    val approx = graft.ops.SimilaritySearch
      .bruteForceTopK(dq.filter(col("vec_id") =!= 0), "vec_id", "emb_q", queryVec, 20)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 top-20 recall $recall < 0.8")
  }

  test("out-of-range inputs clamp (new data against old bounds) instead of erroring") {
    val fit = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 10.0))).toDF("id", "v")
    val (lo, hi) = Quantize.fitBounds(fit, "v")
    val fresh = Seq((3L, Seq(1e9, -1e9))).toDF("id", "v")
    val q = fresh.select(Quantize.quantize(col("v"), lo, hi).as("q"))
      .as[Seq[Int]].head()
    assert(q == Seq(127, -128))
  }
}
