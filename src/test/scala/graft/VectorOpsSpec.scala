package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

class VectorOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("meanPool: hand-computed means, one vector per group") {
    val df = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 6.0)),
      ("b", Seq(10.0, 0.0)))
      .toDF("g", "v")
    val got = VectorOps.meanPool(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 4.0))
    assert(got("b") == Seq(10.0, 0.0))
  }

  test("meanPool is bit-identical under repartitioning (decimal-exact sums)") {
    val one = VectorOps.meanPool(emb.repartition(1), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val many = VectorOps.meanPool(emb.repartition(11), "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(one.keySet == many.keySet && one.keySet.nonEmpty)
    one.foreach { case (k, v) =>
      assert(v.zip(many(k)).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      }, s"group $k drifted under repartitioning")
    }
  }

  test("matryoshka: truncates to dims and re-normalizes to unit length") {
    val got = VectorOps.matryoshka(emb, "embedding", dims = 4)
      .select("embedding").collect().map(_.getSeq[Double](0))
    assert(got.nonEmpty)
    got.foreach { v =>
      assert(v.length == 4)
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9 || norm == 0.0, s"norm $norm")
    }
    // zero vector passes through unchanged
    val z = VectorOps.matryoshka(Seq(Seq(0.0, 0.0, 0.0, 0.0, 5.0)).toDF("embedding"),
      "embedding", dims = 4).select("embedding").head().getSeq[Double](0)
    assert(z == Seq(0.0, 0.0, 0.0, 0.0))
  }
}
