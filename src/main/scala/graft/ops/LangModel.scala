package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted n-gram language-model artifact — the KenLM-shaped "train once,
  * score forever" split that CCNet (Wenzek et al. 2020) builds its fluency
  * signal on: the model is fit on a trusted corpus (wiki), persisted, and
  * every later web crawl only SCORES against the frozen artifact. The
  * reference pipeline has no LM (its quality signals are schema checks —
  * e.g. `/root/reference/atd_data_lake/support/unitdata.py`); this is part
  * of the declared training-data extension surface, completing the LM
  * family ([[TextAnalysis.kneserNeyScore]] / [[TextAnalysis.stupidBackoffScore]])
  * with the same persisted-artifact contract as the tokenizers
  * ([[Bpe.saveTokenizer]]), classifiers ([[Classify.saveNbModel]],
  * [[Logistic.saveLrModel]]) and ANN indexes ([[SimilaritySearch.saveLshIndex]]).
  *
  * The model IS its three count tables — unigram `(token, _c1)`, bigram
  * `(w1, w2, _c2)`, trigram `(w1, w2, w3, _c3)`; every derived statistic
  * (context totals, continuation counts, corpus size N, vocabulary size V)
  * is a bounded re-aggregation of them. Counts are mergeable sums, so
  * incremental maintenance is EXACT: [[append]] writes the new batch's
  * count rows as deltas and [[load]] re-aggregates by key, making
  * append-then-load ≡ fit-on-the-union rank-for-rank — no approximation,
  * no re-resolution step (unlike the suffix-array append, where order keys
  * interleave). [[compactTo]] folds an append log back to one row per gram
  * when the delta count grows.
  *
  * Scale shape: fitting is three map-side-combinable count aggregates over
  * ONE corpus pass each; the artifact is keyed by gram (never by document),
  * so its size is the TYPE count, not the token count; scoring is the
  * keyed-join plan of the FromCounts scorers. Append cost tracks the NEW
  * batch alone — the history tables are never read, let alone reshuffled.
  */
object LangModel {

  /** The loaded model: aggregated count tables (one row per gram). */
  case class NgramLm(c1: DataFrame, c2: DataFrame, c3: DataFrame)

  private val MetaFile = "_lm_meta.json"

  /** Fit the three count tables. All three frames are LAZY — a consumer
    * that only scores KN (bigram-only) never executes the trigram pass.
    */
  def fit(train: DataFrame, idCol: String, textCol: String): NgramLm =
    NgramLm(
      TextAnalysis.df1(train, idCol, textCol),
      TextAnalysis.bigramCounts(train, idCol, textCol),
      TextAnalysis.trigramCounts(train, idCol, textCol))

  /** Vocabulary size |V| = distinct train tokens — one row per token in
    * `c1`, so it is a count of the (bounded) type table, not a corpus pass.
    */
  def vocabSize(lm: NgramLm): Long = lm.c1.count()

  /** Kneser-Ney bigram scoring against the model; `vocabSize <= 0` derives
    * |V| from the model itself ([[vocabSize]]).
    */
  def scoreKneserNey(
      lm: NgramLm,
      score: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Long = 0L,
      discount: Double = 0.75): DataFrame =
    TextAnalysis.kneserNeyScoreFromCounts(
      lm.c2, score, idCol, textCol,
      if (vocabSize > 0) vocabSize else this.vocabSize(lm), discount)

  /** Trigram stupid-backoff scoring against the model; `vocabSize <= 0`
    * derives |V| from the model itself.
    */
  def scoreStupidBackoff(
      lm: NgramLm,
      score: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Long = 0L,
      lambda: Double = 0.4): DataFrame =
    TextAnalysis.stupidBackoffScoreFromCounts(
      lm.c1, lm.c2, lm.c3, score, idCol, textCol,
      if (vocabSize > 0) vocabSize else this.vocabSize(lm), lambda)

  /** Persist the model: three parquet tables + a geometry sidecar (the
    * [[MetaJson]] contract — a later [[load]]/[[append]] validates the dir
    * is actually an LM artifact instead of guessing).
    */
  def save(lm: NgramLm, path: String): Unit = {
    lm.c1.write.mode("overwrite").parquet(s"$path/c1")
    lm.c2.write.mode("overwrite").parquet(s"$path/c2")
    lm.c3.write.mode("overwrite").parquet(s"$path/c3")
    MetaJson.write(lm.c1.sparkSession, path, MetaFile, Seq("grams" -> 3L))
  }

  /** Load a persisted model. Each table re-aggregates by its gram key so
    * any [[append]]ed delta rows fold in — on a freshly-[[save]]d or
    * [[compactTo]]-ed artifact the sum is a no-op over one row per key.
    * The re-aggregation keeps scoring plans identical in SHAPE either way
    * (the scorers' joins see one row per gram, exactly what fit produces).
    */
  def load(spark: SparkSession, path: String): NgramLm = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("grams"), "a model written by LangModel.save")
    require(f("grams") == 3, s"unsupported LM artifact arity ${f("grams")} at $path")
    NgramLm(
      spark.read.parquet(s"$path/c1")
        .groupBy("token").agg(sum("_c1").as("_c1")),
      spark.read.parquet(s"$path/c2")
        .groupBy("w1", "w2").agg(sum("_c2").as("_c2")),
      spark.read.parquet(s"$path/c3")
        .groupBy("w1", "w2", "w3").agg(sum("_c3").as("_c3")))
  }

  /** Incrementally fold a new train batch into a persisted model: the
    * batch's own count tables append as DELTA rows; [[load]] sums them with
    * history. Because counts are associative sums, append-then-load is
    * EXACTLY fit on the union corpus — spec'd rank-for-rank. History files
    * are never read or rewritten; append cost tracks the batch, not the
    * corpus. Single-writer discipline as with every other artifact family.
    */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): Unit = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("grams"), "a model written by LangModel.save")
    require(f("grams") == 3, s"unsupported LM artifact arity ${f("grams")} at $path")
    val lm = fit(batch, idCol, textCol)
    lm.c1.write.mode("append").parquet(s"$path/c1")
    lm.c2.write.mode("append").parquet(s"$path/c2")
    lm.c3.write.mode("append").parquet(s"$path/c3")
  }

  /** Rewrite an append-heavy artifact as a fresh one-row-per-gram artifact
    * at `dest` (a NEW directory — the caller swaps pointers, so a crashed
    * compaction can never corrupt the source; the staging-then-publish
    * discipline of [[graft.catalog.SnapshotLake]]).
    */
  def compactTo(spark: SparkSession, path: String, dest: String): Unit = {
    require(path != dest, "compactTo dest must differ from the source artifact")
    save(load(spark, path), dest)
  }
}
