package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Pca

class PcaSpec extends SparkSpec {

  import spark.implicits._

  /** 40 points on a 2-plane in 5D: x = t·a + s·b + mean, with a ⊥ b.
    * Rank-2 by construction — eigenvalues 3..5 must be ~0.
    */
  private def planar: DataFrame = {
    val a = Array(1.0, 2.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(5.0))
    val b = Array(0.0, 0.0, 3.0, 4.0, 0.0).map(_ / 5.0)
    val mean = Array(10.0, 20.0, 30.0, 40.0, 50.0)
    val rows = for (ti <- -4 to 5; si <- 0 until 4) yield {
      val t = ti * 2.0; val s = si * 0.5
      (ti * 10L + si,
        (0 until 5).map(d => (mean(d) + t * a(d) + s * b(d)).toFloat).toArray.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def fitPlanar = Pca.fit(planar, "embedding", dims = 5, kComponents = 5)

  test("components are orthonormal and eigenvalues descend") {
    val m = fitPlanar
    for (i <- 0 until m.k; j <- i until m.k) {
      val dot = m.components(i).zip(m.components(j)).map { case (x, y) => x * y }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"<w$i, w$j> = $dot")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("trace is preserved: sum of eigenvalues equals total variance") {
    val m = fitPlanar
    val cov = Pca.covariance(planar, "embedding", 5)
      .filter(col("i") === col("j"))
      .agg(sum("cov")).collect().head.getDouble(0)
    assert(math.abs(m.eigenvalues.sum - cov) < 1e-6,
      s"Σλ=${m.eigenvalues.sum} vs trace=$cov")
  }

  test("rank-2 data: two real axes recovered, remaining eigenvalues ~0") {
    val m = fitPlanar
    assert(m.eigenvalues(0) > 1e-3 && m.eigenvalues(1) > 1e-3)
    assert(math.abs(m.eigenvalues(2)) < 1e-9)
    assert(math.abs(m.eigenvalues(3)) < 1e-9)
    assert(math.abs(m.eigenvalues(4)) < 1e-9)
    // the recovered plane spans {a, b}: each true axis reconstructs from
    // its projections onto the top-2 components
    val a = Array(1.0, 2.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(5.0))
    val b = Array(0.0, 0.0, 3.0, 4.0, 0.0).map(_ / 5.0)
    for (axis <- Seq(a, b)) {
      val c0 = axis.zip(m.components(0)).map { case (x, y) => x * y }.sum
      val c1 = axis.zip(m.components(1)).map { case (x, y) => x * y }.sum
      val recon = (0 until 5).map(d => c0 * m.components(0)(d) + c1 * m.components(1)(d))
      axis.zip(recon).foreach { case (x, r) =>
        assert(math.abs(x - r) < 1e-6, s"axis not in span: $x vs $r")
      }
    }
  }

  test("projection variance equals the eigenvalue, centered at ~0 mean") {
    val m = Pca.fit(planar, "embedding", 5, 2)
    val proj = Pca.transform(planar, "embedding", Seq("vec_id"), m)
      .select(posexplode(col("proj")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    for (jc <- 0 until 2) {
      val xs = proj.filter(_._1 == jc).map(_._2)
      val mu = xs.sum / xs.length
      assert(math.abs(mu) < 1e-9, s"projection $jc not centered: $mu")
      val varr = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(varr - m.eigenvalues(jc)) < 1e-6,
        s"var(proj$jc)=$varr vs λ=${m.eigenvalues(jc)}")
    }
  }

  test("fit is bit-identical under repartitioning (exact sums + fixed sweeps)") {
    val m1 = Pca.fit(planar.repartition(1), "embedding", 5, 3)
    val m7 = Pca.fit(planar.repartition(7), "embedding", 5, 3)
    assert(m1.eigenvalues.toSeq == m7.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m7.components.map(_.toSeq).toSeq)
    assert(m1.mean.toSeq == m7.mean.toSeq)
  }

  test("sign normalization: each component's largest-|x| entry is positive") {
    val m = fitPlanar
    m.components.foreach { w =>
      val pivot = w.indices.maxBy(i => (math.abs(w(i)), -i))
      assert(w(pivot) >= 0.0)
    }
  }

  test("wrong-dims and null vectors are excluded; empty input refuses") {
    val mixed = planar.union(Seq(
      (900L, Seq(1.0f, 2.0f)),
      (901L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val m = Pca.fit(mixed, "embedding", 5, 2)
    assert(m.eigenvalues.toSeq == fitPlanar.eigenvalues.take(2).toSeq)
    intercept[IllegalArgumentException] {
      Pca.fit(planar.limit(0), "embedding", 5, 2)
    }
  }

  test("saved model loads bit-identical and a bare dir refuses") {
    val m = Pca.fit(planar, "embedding", 5, 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_").toString + "/model"
    Pca.saveModel(spark, m, dir)
    val loaded = Pca.loadModel(spark, dir)
    assert(loaded.dims == m.dims)
    assert(loaded.mean.toSeq == m.mean.toSeq)
    assert(loaded.eigenvalues.toSeq == m.eigenvalues.toSeq)
    assert(loaded.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    val p1 = Pca.transform(planar, "embedding", Seq("vec_id"), m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = Pca.transform(planar, "embedding", Seq("vec_id"), loaded)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p2)
    val bare = java.nio.file.Files.createTempDirectory("graft_pca_bare_").toString
    intercept[IllegalArgumentException] { Pca.loadModel(spark, bare) }
  }

  test("transform stays inside whole-stage codegen (fused dots, no shuffle)") {
    val m = Pca.fit(planar, "embedding", 5, 2)
    val plan = Pca.transform(planar, "embedding", Seq("vec_id"), m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
  test("whiten: projected components have ~unit variance") {
    val m = Pca.fit(planar, "embedding", 5, 2)
    val proj = Pca.whiten(planar, "embedding", Seq("vec_id"), m)
      .select(posexplode(col("proj")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    for (jc <- 0 until 2) {
      val xs = proj.filter(_._1 == jc).map(_._2)
      val mu = xs.sum / xs.length
      val varr = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(varr - 1.0) < 1e-6, s"var(white$jc)=$varr")
    }
  }
}
