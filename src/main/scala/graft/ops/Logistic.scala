package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Binary logistic-regression text classifier over hashed n-gram counts —
  * the "pages that look like references" quality filter of the GPT-3 /
  * LLaMA data pipelines, complementing [[Classify]]'s Naive Bayes: NB is
  * the cheap generative scorer, this is the discriminative one trained by
  * full-batch gradient descent, and both share the same feature hashing
  * ([[ImportanceSampling.hashedFeatureRows]] — md5-bucketed n-grams), so a
  * curation stack can swap scorers without re-featurizing.
  *
  * Scale shape:
  *   - Features build ONCE: per-document sparse (bucket, count) arrays,
  *     bucket-sorted, localCheckpoint'd — every GD iteration reuses them.
  *   - One job per iteration, ONE map-side-combinable shuffle: the margin
  *     is a per-ROW array fold (weights enter as a literal array — bounded
  *     by `buckets`, the model is broadcast-sized by construction), the
  *     residual is per-row, and the gradient aggregate groups the exploded
  *     (bucket, r·x) contributions — partial aggregation reduces the
  *     exchange to ≤ `buckets` rows per task. No corpus-keyed join, no
  *     driver-side data pass.
  *   - Determinism: per-(doc, bucket) gradient contributions are quantized
  *     to DECIMAL(38,18) before the exact commutative sum (the [[Unigram]]
  *     E-step discipline), margins fold bucket-sorted arrays left-to-right,
  *     and the driver update walks buckets in order — the learned weights
  *     are bit-identical under any partitioning, and golden-oracled against
  *     an independent Python implementation (tools/gen_lr_golden.py).
  *
  * Reference analog: none (training-data extension) — SURVEY §2's
  * text-analysis/classifier surface, [[Classify]]'s sibling.
  */
object Logistic {

  /** A fitted model: `weights` is (bucket, weight) over the FULL bucket
    * domain plus the intercept at bucket −1; `n`/`buckets` are the feature
    * geometry it was trained under (scoring at different geometry would
    * silently hash into different buckets, so the artifact carries both).
    */
  case class LrModel(weights: DataFrame, n: Int, buckets: Int)

  private def sigmoid(m: Double): Double = 1.0 / (1.0 + math.exp(-m))

  /** Per-document bucket-sorted sparse feature arrays: (id, y?, feats)
    * where feats = array<struct<bucket, x>>; documents with fewer than `n`
    * tokens carry an empty array (their margin is the intercept alone,
    * and they still push the intercept gradient).
    */
  private def docFeatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      buckets: Int,
      extra: Seq[Column]): DataFrame = {
    // hashedFeatureRows applies carryCols in two selects, so they must be
    // plain column references — pre-project the cast id
    val rows = ImportanceSampling.hashedFeatureRows(
      docs.select(col(idCol).cast("long").as("_id"), col(textCol)),
      textCol, n, buckets, carryCols = Seq(col("_id")))
      .groupBy("_id", "bucket").agg(count(lit(1)).cast("double").as("_x"))
      .groupBy("_id")
      .agg(sort_array(collect_list(struct(col("bucket"), col("_x")))).as("_f"))
    docs.select((col(idCol).cast("long").as("_id") +: extra): _*)
      .join(rows, Seq("_id"), "left")
      .withColumn("_f", coalesce(col("_f"),
        array().cast("array<struct<bucket:bigint,_x:double>>")))
  }

  /** margin = w₀ + Σ w[bucket]·x, folded left-to-right over the
    * bucket-sorted array — a fixed association order, so the double sum is
    * reproducible everywhere. Fused codegen'd
    * [[graft.expressions.WeightedBucketSum]] (this is the per-document hot
    * loop of corpus-scale scoring); [[marginColHof]] is the fold it must
    * match bit-for-bit.
    */
  private def marginCol(w: Array[Double], b0: Double): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WeightedBucketSum(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("_f")),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(w), b0))

  /** The original higher-order fold — kept as the executable specification
    * of [[marginCol]] (VectorExpressionsSpec pins bit-identical margins).
    */
  private[graft] def marginColHof(w: Array[Double], b0: Double): Column =
    aggregate(col("_f"), lit(b0),
      (acc, s) => acc +
        element_at(array(w.map(lit).toSeq: _*), s.getField("bucket").cast("int") + 1) *
          s.getField("_x"))

  /** Fit by `iters` rounds of full-batch gradient descent with step size
    * `step` and L2 strength `l2` (intercept unregularized, the standard
    * convention). `labelCol` must be 0/1-valued (cast to double); rows with
    * a NULL label or id are rejected loudly — silently dropping them would
    * train on a different corpus than the caller audited.
    */
  def lrFit(
      docs: DataFrame,
      labelCol: String,
      textCol: String,
      n: Int = 2,
      buckets: Int = 256,
      iters: Int = 40,
      step: Double = 0.5,
      l2: Double = 1e-3): LrModel = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(step > 0, s"step must be > 0, got $step")
    require(l2 >= 0, s"l2 must be >= 0, got $l2")
    val spark = docs.sparkSession
    import spark.implicits._
    // docFeatures keys on an id column; for training the PK is irrelevant
    // (gradients sum over rows, never group by id), so synthesize one —
    // partitioning-dependent ids cannot leak into the learned weights
    // localCheckpoint BEFORE fanning out: docFeatures evaluates this frame
    // on two branches (features and labels) and the synthetic row id must
    // be the SAME row id on both — a non-deterministic source re-evaluated
    // per branch would silently pair features with the wrong labels
    val base = docs
      .withColumn("_y", col(labelCol).cast("double"))
      .withColumn("_rowid", monotonically_increasing_id())
      .localCheckpoint()
    val bad = base.filter(col("_y").isNull || (col("_y") =!= 0.0 && col("_y") =!= 1.0))
      .limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"label column '$labelCol' must be 0/1 and non-null for every row")
    val perDoc = docFeatures(base, "_rowid", textCol, n, buckets, extra = Seq(col("_y")))
      .localCheckpoint() // features build once; every iteration reuses them
    val nDocs = perDoc.count().toDouble
    require(nDocs > 0, "empty training corpus")
    var w = Array.fill(buckets)(0.0)
    var b0 = 0.0
    for (_ <- 1 to iters) {
      // one pass: residual per doc, exploded (bucket, r·x) + intercept
      // sentinel at bucket −1, decimal-exact commutative gradient sum
      val grads = perDoc
        .withColumn("_r", lit(1.0) / (lit(1.0) + exp(-marginCol(w, b0))) - col("_y"))
        .select(explode(concat(
          array(struct(lit(-1L).as("bucket"), col("_r").as("_g"))),
          transform(col("_f"), s => struct(
            s.getField("bucket").as("bucket"),
            (col("_r") * s.getField("_x")).as("_g"))))).as("_e"))
        .select(col("_e.bucket").as("bucket"),
          col("_e._g").cast(DecimalType(38, 18)).as("_g"))
        .groupBy("bucket").agg(sum(col("_g")).as("_g"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
      val next = Array.tabulate(buckets) { b =>
        w(b) - step * (grads.getOrElse(b.toLong, 0.0) / nDocs + l2 * w(b))
      }
      b0 -= step * (grads.getOrElse(-1L, 0.0) / nDocs)
      w = next
    }
    val rows = (-1L -> b0) +: w.zipWithIndex.map { case (v, b) => b.toLong -> v }.toSeq
    LrModel(rows.toDF("bucket", "weight"), n, buckets)
  }

  /** Scores under a (possibly loaded) model: (id, margin, score) with
    * `score = roundHalfUp(sigmoid(margin), 6)`. Zero-shuffle apart from the
    * per-doc feature aggregation; the model enters as a literal array.
    * Null/uncastable ids drop (the sampling module's null-key rule).
    * `idCol` must be unique per row (after the long cast): duplicate ids
    * would merge their documents' features into one vector — the id IS the
    * feature-aggregation key, as everywhere in the scoring family.
    */
  def lrScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LrModel): DataFrame = {
    val collected = model.weights.select("bucket", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = Array.tabulate(model.buckets)(b => collected.getOrElse(b.toLong, 0.0))
    val b0 = collected.getOrElse(-1L, 0.0)
    docFeatures(docs.filter(col(idCol).isNotNull && col(idCol).cast("long").isNotNull),
        idCol, textCol, model.n, model.buckets, extra = Seq.empty)
      .withColumn("_m", marginCol(w, b0))
      .select(col("_id").as(idCol), col("_m").as("margin"),
        graft.Functions.roundHalfUp(lit(1.0) / (lit(1.0) + exp(-col("_m"))), 6).as("score"))
  }

  /** Hard decisions: (id, pred) with pred = 1 iff margin ≥ 0 — decided on
    * the EXACT margin, not the rounded score, so a score that rounds to
    * 0.5 can never flip the class between engines.
    */
  def lrPredict(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LrModel): DataFrame =
    lrScores(docs, idCol, textCol, model)
      .select(col(idCol), when(col("margin") >= 0, 1L).otherwise(0L).as("pred"))

  private val MetaFile = "_lr_meta.json"

  /** Persist a fitted model — weights as parquet, feature geometry as a
    * sidecar (the [[Unigram.saveTokenizer]] / NbModel pattern): score on
    * any cluster without refitting, bit-identically.
    */
  def saveLrModel(model: LrModel, path: String): Unit = {
    val spark = model.weights.sparkSession
    model.weights.select("bucket", "weight").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/weights")
    MetaJson.write(spark, path, MetaFile,
      Seq("n" -> model.n.toLong, "buckets" -> model.buckets.toLong))
  }

  /** Load a model written by [[saveLrModel]]; refuses a bare directory
    * rather than guessing feature geometry.
    */
  def loadLrModel(spark: SparkSession, path: String): LrModel = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("n", "buckets"), "a model written by Logistic.saveLrModel")
    LrModel(spark.read.parquet(s"$path/weights"), f("n"), f("buckets"))
  }
}
