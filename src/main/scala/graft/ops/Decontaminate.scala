package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents whose n-gram shingle
  * sets overlap an evaluation/test document — the standard pre-training
  * hygiene pass (report the eval items a train doc covers, drop or flag the
  * train doc). Contamination is measured as containment of the EVAL
  * document: `|train ∩ eval| / |eval|` — a train doc that embeds a whole
  * benchmark item scores 1.0 regardless of how much other text surrounds it.
  *
  * Scale shape (the asymmetry is the whole design): the train corpus is
  * 100 TB, the eval suite is MBs. The eval shingle index is broadcast, so
  * the train side is one scan with a map-side hash probe — no shuffle of
  * train shingles ever happens; the only exchange is the per-(train, eval)
  * pair count over rows that MATCHED an eval shingle, which is proportional
  * to actual contamination, not corpus size. (A 100 GB eval suite would
  * instead use the [[Dedup.ngramContainmentPairs]] inverted-index shuffle
  * shape; the operator picks broadcast because eval suites are small by
  * construction.)
  */
object Decontaminate {

  /** (train_id, eval_id, contamination) pairs with contamination ≥
    * `threshold`, over `n`-word shingles hashed to 60-bit longs (same
    * hashing as the dedup family, so any SQL engine reproduces it).
    */
  def ngramOverlap(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0, "broadcast-probe decontamination requires a positive threshold")
    def hashed(df: DataFrame, idCol: String, textCol: String, outId: String) =
      Dedup.shingleRows(df, idCol, textCol, n)
        .select(col(idCol).as(outId), graft.Functions.md5Bits(col("shingle"), 60).as("shh"))
    // distinct eval shingles + per-doc set size: eval-suite-sized, broadcast
    val evalSh = hashed(eval, evalIdCol, evalTextCol, "eval_id")
      .distinct()
      .withColumn("eval_sz", count(lit(1)).over(Window.partitionBy(col("eval_id"))))
    // train side is NOT pre-deduplicated (that would shuffle the whole
    // corpus); duplicate train shingles survive the broadcast probe and are
    // collapsed by the count_distinct in the pair aggregate, which only sees
    // matched rows
    val matches = hashed(train, trainIdCol, trainTextCol, "train_id")
      .join(broadcast(evalSh), Seq("shh"))
    matches
      .groupBy(col("train_id"), col("eval_id"), col("eval_sz"))
      .agg(count_distinct(col("shh")).as("inter"))
      .select(
        col("train_id"), col("eval_id"),
        graft.Functions.roundHalfUp(
          col("inter").cast("double") / col("eval_sz").cast("double"), 4)
          .as("contamination"))
      .filter(col("contamination") >= threshold)
  }

  /** A persisted corpus-side shingle index: distinct (train_id, shh)
    * postings bucketed by `pmod(shh, buckets)`. Carrying (n, buckets) in
    * the type — and in the sidecar on disk — closes the silent-wrong-answer
    * hole a mismatched shingle width or bucket count would open (the
    * LshIndex lesson).
    */
  case class ShingleIndex(relation: DataFrame, n: Int, buckets: Int)

  /** Build the index with ONE corpus pass. This inverts [[ngramOverlap]]'s
    * cost model for the recurring case: the corpus is 100 TB and re-scanned
    * per decontamination run, but benchmarks ARRIVE incrementally — index
    * the corpus once, then each new eval suite probes only the hash-bucket
    * partitions its own shingles land in.
    */
  def buildShingleIndex(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      n: Int = 3,
      buckets: Int = 64): ShingleIndex = {
    require(n >= 1 && buckets >= 1)
    ShingleIndex(
      Dedup.shingleRows(train, trainIdCol, trainTextCol, n)
        .select(
          col(trainIdCol).as("train_id"),
          graft.Functions.md5Bits(col("shingle"), 60).as("shh"))
        .distinct()
        .withColumn("sh_bucket", pmod(col("shh"), lit(buckets.toLong))),
      n, buckets)
  }

  private val ShingleMetaFile = "_shingle_meta.json"

  def saveShingleIndex(index: ShingleIndex, path: String): Unit = {
    index.relation.write.mode("overwrite").partitionBy("sh_bucket").parquet(path)
    val spark = index.relation.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, ShingleMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"n":${index.n},"buckets":${index.buckets}}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def loadShingleIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): ShingleIndex = {
    val p = new org.apache.hadoop.fs.Path(path, ShingleMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path has no $ShingleMetaFile — not an index written by saveShingleIndex")
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    def field(name: String): Int = {
      val m = (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(json)
      require(m.isDefined, s"$ShingleMetaFile at $path is missing field $name: $json")
      m.get.group(1).toInt
    }
    ShingleIndex(spark.read.parquet(path), field("n"), field("buckets"))
  }

  /** Decontaminate a NEW eval suite against the prebuilt index: the eval
    * side is shingled (MB-scale), its bucket set is collected driver-side
    * (≤ `buckets` values, bounded by construction), and the index scan
    * prunes to those partition directories before the hash join runs — the
    * corpus is never re-tokenized. Identical results to [[ngramOverlap]]
    * (the spec pins equivalence): the index stores DISTINCT postings, so a
    * plain count is the same as the direct path's `count_distinct`.
    */
  def ngramOverlapIndexed(
      index: ShingleIndex,
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0, "indexed decontamination requires a positive threshold")
    val evalSh = Dedup.shingleRows(eval, evalIdCol, evalTextCol, index.n)
      .select(
        col(evalIdCol).as("eval_id"),
        graft.Functions.md5Bits(col("shingle"), 60).as("shh"))
      .distinct()
      .withColumn("eval_sz", count(lit(1)).over(Window.partitionBy(col("eval_id"))))
    val evalBuckets = evalSh
      .select(pmod(col("shh"), lit(index.buckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    index.relation
      .filter(col("sh_bucket").isin(evalBuckets: _*))
      .join(broadcast(evalSh), Seq("shh"))
      .groupBy(col("train_id"), col("eval_id"), col("eval_sz"))
      .agg(count(lit(1)).as("inter"))
      .select(
        col("train_id"), col("eval_id"),
        graft.Functions.roundHalfUp(
          col("inter").cast("double") / col("eval_sz").cast("double"), 4)
          .as("contamination"))
      .filter(col("contamination") >= threshold)
  }

  /** Char-grain exact-substring decontamination (the Lee et al.
    * "Deduplicating Training Data Makes Language Models Better"
    * exact-substring rule applied against a benchmark): spans of corpus
    * documents that reproduce a `minLen`-consecutive-char run of the
    * benchmark suite, where the benchmark is held ONLY as its persisted
    * window-hash artifact ([[SuffixArray.saveCrossDocHashes]] over the
    * benchmark text; window length from the artifact's own sidecar).
    * Returns `(idCol, span_start, span_end)` with overlapping windows
    * merged into maximal spans.
    *
    * Unlike the token-grain [[ngramOverlap]] (containment SCORES at the
    * document grain, for flag/drop decisions), this reports the exact
    * character extents — the input [[exactSubstringClean]] cuts. And
    * unlike [[SuffixArray.crossDocSpansAgainstHistory]] (the dedup
    * vs-history probe), corpus-INTERNAL repetition never flags: only
    * overlap with the benchmark is contamination. The benchmark side
    * broadcasts; the corpus never shuffles.
    */
  def exactSubstringOverlap(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmarkHashesDir: String,
      broadcastHashes: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val minLen = SuffixArray.crossDocHashesMinLen(spark, benchmarkHashesDir)
    SuffixArray.charSpansMatchingHashes(
      corpus, spark.read.parquet(benchmarkHashesDir).select("win_hash"),
      idCol, textCol, minLen, broadcastHashes)
  }

  /** The removal composition: `corpus` with every benchmark-contaminated
    * span CUT out of the text ([[Dedup.removeCharSpans]]) — documents with
    * no contamination pass through byte-identical.
    */
  def exactSubstringClean(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmarkHashesDir: String,
      broadcastHashes: Boolean = true): DataFrame =
    Dedup.removeCharSpans(
      corpus,
      exactSubstringOverlap(corpus, idCol, textCol, benchmarkHashesDir, broadcastHashes),
      idCol, textCol)
}
