package graft

import org.apache.spark.sql.functions._

import graft.ops.RandomProjection

/** JL random-projection invariants: the sign matrix is deterministic, the
  * map is linear, and squared norms are preserved in expectation (the
  * property every downstream distance/similarity estimate rests on).
  */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(sf("embeddings"))

  test("sign matrix is ±1, deterministic, and roughly balanced") {
    val m = RandomProjection.signMatrix(16, 64)
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(v => v == 1.0 || v == -1.0))
    // same derivation → same matrix; different salt → different matrix
    assert(m.map(_.toSeq).toSeq == RandomProjection.signMatrix(16, 64).map(_.toSeq).toSeq)
    assert(m.map(_.toSeq).toSeq !=
      RandomProjection.signMatrix(16, 64, salt = "other").map(_.toSeq).toSeq)
    // md5 uniforms put each entry at ±1 with p=1/2: the global mean must be
    // near 0 (1024 entries → |mean| < 4/sqrt(1024) w.h.p.)
    val mean = m.flatten.sum / (16 * 64)
    assert(math.abs(mean) < 0.125, s"sign matrix biased: mean $mean")
  }

  test("norm preservation in expectation: mean ||Rx||^2 / ||x||^2 near 1") {
    val sq = (c: org.apache.spark.sql.Column) =>
      aggregate(c, lit(0.0), (a, x) => a + x * x)
    val ratios = RandomProjection.project(emb, "vec_id", "embedding", 16, 64)
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "vec_id")
      .select((sq(col("projected")) / sq(col("v"))).as("r"))
      .agg(avg("r"), stddev("r")).as[(Double, Double)].head()
    // per-vector ratio has variance ~2/16; the mean over 500 vectors
    // concentrates hard around 1
    assert(ratios._1 > 0.9 && ratios._1 < 1.1, s"mean norm ratio ${ratios._1}")
    assert(ratios._2 < 0.8, s"ratio spread ${ratios._2}")
  }

  test("projection is linear and partitioning-invariant") {
    val two = emb.select(col("vec_id"), transform(col("embedding").cast("array<double>"),
      x => x * 2.0).as("embedding"))
    val p1 = RandomProjection.project(emb, "vec_id", "embedding", 8, 64)
      .select(col("vec_id"), col("projected"))
    val p2 = RandomProjection.project(two, "vec_id", "embedding", 8, 64)
    val joined = p1.join(p2.withColumnRenamed("projected", "p2"), "vec_id")
      .select(explode(zip_with(col("projected"), col("p2"), (a, b) => abs(a * 2.0 - b))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(joined < 1e-9, s"linearity violated by $joined")

    val a = RandomProjection.project(emb, "vec_id", "embedding", 8, 64)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val b = RandomProjection.project(emb.repartition(7), "vec_id", "embedding", 8, 64)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(a == b)
  }
}
