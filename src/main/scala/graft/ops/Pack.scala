package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** Sequence packing: assemble documents/chunks into fixed-token-budget
  * training sequences — the step between chunking ([[TextAnalysis]]) and
  * batch assembly in an LLM data pipeline.
  *
  * Both packers shard the corpus by an md5 hash of the id and pack within
  * shards, so the layout is deterministic (rerun- and partitioning-stable,
  * like everything in [[Sampling]]) and embarrassingly parallel: one keyed
  * shuffle, shard count = parallelism knob, no global coordination. At
  * 100 TB a shard is still a bounded slice (pick `numShards` ≈ cluster
  * cores × a few), and sequences are keyed (shard, seq_idx) so downstream
  * consumers never need a global sequence counter.
  */
object Pack {

  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  private def shardOf(id: Column, numShards: Int, salt: String): Column =
    pmod(Functions.md5Bits(concat(lit(s"${salt}shard"), id.cast("string")), 32),
      lit(numShards)).cast("long")

  private def orderKey(id: Column, salt: String): Column =
    Sampling.hashUniform(id, salt)

  /** Concat-and-chunk packing (the GPT-style layout): within each shard,
    * documents are laid end-to-end in deterministic md5 order and cut every
    * `budget` tokens; a document crossing a boundary is split across the
    * two sequences. Every sequence except each shard's last is exactly
    * `budget` tokens — zero padding waste; the cost is cross-document
    * attention bleed at splice points, which the trainer masks.
    *
    * One row per (document × sequence) segment:
    * (shard, seq_idx, id, seq_offset, seg_tokens, seg_text) where
    * `seq_offset` is the segment's 0-based token position inside its
    * sequence. Integer arithmetic over one per-shard running sum — exact,
    * engine-portable, one shuffle keyed by shard.
    */
  def packConcat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      numShards: Int = 32,
      salt: String = "pk"): DataFrame =
    packSegments(df, idCol, toks(col(textCol)), budget, numShards, salt)
      .withColumn("seg_text", concat_ws(" ", col("_seg")))
      .drop("_seg")

  /** [[packConcat]] over ALREADY-TOKENIZED sequences — the layout step after
    * [[Bpe.encodeIds]]: identical concat-and-chunk arithmetic, but segments
    * come back as slices of the input array (`seg_ids`), ready for training
    * batch assembly. One row per (document × sequence) segment:
    * (shard, seq_idx, id, seq_offset, seg_tokens, seg_ids).
    */
  def packTokenIds(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      budget: Int,
      numShards: Int = 32,
      salt: String = "pk"): DataFrame =
    packSegments(df, idCol, col(idsCol), budget, numShards, salt)
      .withColumnRenamed("_seg", "seg_ids")

  /** [[packTokenIds]] that carries a PARALLEL per-token array (the
    * loss-mask case: [[Sft.lossMaskTokens]]' trainable flags, one per
    * token) through the identical chunk arithmetic — each segment slices
    * BOTH arrays with the same [s, e), so `seg_ids(i)` and `seg_mask(i)`
    * always describe the same token after packing. A document whose mask
    * length disagrees with its id length fails LOUDLY (raise_error names
    * the id) instead of packing misaligned supervision. Output adds
    * `seg_mask` to the [[packTokenIds]] columns.
    */
  def packTokenIdsWithMask(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      maskCol: String,
      budget: Int,
      numShards: Int = 32,
      salt: String = "pk"): DataFrame =
    packSegments(df, idCol, col(idsCol), budget, numShards, salt,
      parallel = Seq("seg_mask" -> col(maskCol)))
      .withColumnRenamed("_seg", "seg_ids")

  /** Shared concat-and-chunk core over any token-array column. Zero-token
    * documents pack nowhere and are dropped explicitly: `sequence(a, b)`
    * with b < a would otherwise generate a DESCENDING index range (Spark
    * infers step -1), emitting phantom segments.
    */
  private def packSegments(
      df: DataFrame,
      idCol: String,
      tokensArr: Column,
      budget: Int,
      numShards: Int,
      salt: String,
      parallel: Seq[(String, Column)] = Nil): DataFrame = {
    require(budget >= 1 && numShards >= 1, "need budget >= 1 and numShards >= 1")
    val w = Window.partitionBy(col("shard")).orderBy(col("_u"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(budget.toLong)
    val parallelIn = parallel.map { case (name, c) =>
      // a parallel array whose length disagrees with the token array would
      // pack misaligned supervision — refuse loudly, naming the document
      // (NullType from raise_error coerces to the array branch's type)
      when(coalesce(size(c), lit(-1)) === coalesce(size(tokensArr), lit(-1)), c)
        .otherwise(raise_error(concat(
          lit(s"parallel array '$name' length mismatch at $idCol="),
          col(idCol).cast("string")))).as(s"_p_$name")
    }
    val parallelKeep = parallel.map { case (name, _) => col(s"_p_$name") }
    df.select(
        (col(idCol) +: tokensArr.as("_t") +:
          coalesce(size(tokensArr), lit(0)).cast("long").as("_nt") +:
          shardOf(col(idCol), numShards, salt).as("shard") +:
          orderKey(col(idCol), salt).as("_u") +: parallelIn): _*)
      .filter(col("_nt") >= 1)
      .withColumn("_cum", sum(col("_nt")).over(w))
      .withColumn("_cb", col("_cum") - col("_nt")) // tokens before this doc
      .select(
        (col("shard") +: col(idCol) +: col("_t") +: col("_nt") +: col("_cum") +:
          col("_cb") +:
          explode(sequence(floor(col("_cb") / b), floor((col("_cum") - 1) / b)))
            .as("seq_idx") +: parallelKeep): _*)
      .withColumn("_s", greatest(col("seq_idx") * b - col("_cb"), lit(0L)))
      .withColumn("_e", least((col("seq_idx") + 1) * b, col("_cum")) - col("_cb"))
      .select(
        (col("shard") +: col("seq_idx") +: col(idCol) +:
          (col("_cb") + col("_s") - col("seq_idx") * b).as("seq_offset") +:
          (col("_e") - col("_s")).as("seg_tokens") +:
          slice(col("_t"),
            (col("_s") + 1).cast("int"), (col("_e") - col("_s")).cast("int")).as("_seg") +:
          parallel.map { case (name, _) =>
            slice(col(s"_p_$name"),
              (col("_s") + 1).cast("int"), (col("_e") - col("_s")).cast("int")).as(name)
          }): _*)
  }

  /** Greedy next-fit packing (no document splitting): within each shard,
    * documents in deterministic md5 order go into the current sequence
    * until one would overflow `budget`, which opens the next sequence. A
    * document longer than the budget occupies a sequence alone (callers
    * chunk first — [[TextAnalysis.chunkTokenWindows]] /
    * [[chunkContentDefined]] — when that matters).
    *
    * The fold is inherently sequential per shard, so it runs as a typed
    * `flatMapGroups` over the shard's (order, id, tokens) triples — one
    * O(n log n) sort + O(n) pass per shard, never text: a 10⁹-document
    * corpus at 4096 shards folds ~250 k triples (~6 MB) per task. (A
    * Catalyst `aggregate` fold appending to an accumulator array would
    * COPY the array per element — O(n²) per shard — which is why this op
    * drops to the typed API.) Output: (shard, seq_idx, id, nt).
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      numShards: Int = 32,
      salt: String = "pk"): DataFrame = {
    require(budget >= 1 && numShards >= 1, "need budget >= 1 and numShards >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(
      shardOf(col(idCol), numShards, salt).as("shard"),
      orderKey(col(idCol), salt).as("u"),
      col(idCol).cast("long").as("id"),
      size(toks(col(textCol))).cast("long").as("nt"))
      .as[(Long, Double, Long, Long)]
    items.groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val sorted = it.toArray.sortBy(x => (x._2, x._3)) // (u, id): md5 order
        var bin = 0L
        var fill = budget.toLong + 1L // sentinel: first item opens seq 0 at bin 0
        var first = true
        sorted.iterator.map { case (_, _, id, nt) =>
          if (fill + nt > budget) {
            bin = if (first) 0L else bin + 1L
            fill = nt
          } else fill += nt
          first = false
          (shard, bin, id, nt)
        }
      }
      .toDF("shard", "seq_idx", idCol, "nt")
  }

  /** Length-bucketed batch assembly — the PADDED-batch counterpart of
    * [[packConcat]]'s concat layout: documents route to the smallest
    * bucket edge that fits their token count (fixed, explicit `edges`,
    * ascending — the production trainer convention, and integer-exact in
    * any engine, unlike pow-2-via-log2 float edges), then fill batches of
    * `batchSize` within each bucket in deterministic md5 order. Grouping
    * near-equal lengths is what keeps per-batch padding small when
    * sequences must stay document-aligned (SFT, reward modeling — where
    * concat-packing's attention bleed is unacceptable).
    *
    * One row per kept document: `(id, n_tokens, bucket, batch_idx,
    * pos_in_batch)`. Documents longer than the last edge DROP (they need
    * truncation upstream, and silently routing them to a too-small bucket
    * would corrupt the padding accounting); NULL ids and NULL texts drop;
    * empty docs land in the first bucket at 1 token (`split` on whitespace
    * never yields 0 tokens).
    *
    * Scale shape: bucket assignment is a per-row CASE over the bounded
    * edge list (zero shuffle); batch numbering is one rank window per
    * bucket — the same single-exchange class as [[Sampling.epochShuffle]],
    * with ≤ |edges| partitions of the window key space. Pair with
    * [[paddingWaste]] for the efficiency report.
    */
  def lengthBucketBatches(
      df: DataFrame,
      idCol: String,
      textCol: String,
      edges: Seq[Long],
      batchSize: Int,
      salt: String = "lb"): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      s"edges must be non-empty, ascending, distinct: $edges")
    require(edges.head >= 1, s"smallest edge must be >= 1: $edges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val nt = size(toks(col(textCol))).cast("long")
    val bucket = edges.reverse.foldLeft(lit(null).cast("long")) { (acc, e) =>
      when(col("n_tokens") <= e, lit(e)).otherwise(acc)
    }
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("_u"), col(idCol))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), nt.as("n_tokens"), orderKey(col(idCol), salt).as("_u"))
      .withColumn("bucket", bucket)
      .filter(col("bucket").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .select(
        col(idCol), col("n_tokens"), col("bucket"),
        ((col("_rn") - 1L) / batchSize).cast("long").as("batch_idx"),
        ((col("_rn") - 1L) % batchSize).as("pos_in_batch"))
  }

  /** Padding-efficiency report over a [[lengthBucketBatches]] assignment:
    * per (bucket, batch) — row count, the batch's max length (what dynamic
    * padding pads to), actual vs padded token totals, and the waste
    * fraction `1 − actual/padded` rounded half-up 6. One keyed aggregate
    * on the (bucket, batch) pair; integer arithmetic until the final
    * quantized divide.
    */
  def paddingWaste(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(
        count(lit(1)).as("rows"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("actual_tokens"))
      .select(
        col("bucket"), col("batch_idx"), col("rows"), col("max_len"),
        col("actual_tokens"),
        (col("rows") * col("max_len")).as("padded_tokens"),
        Functions.roundHalfUp(
          lit(1.0) - col("actual_tokens").cast("double") /
            (col("rows") * col("max_len")).cast("double"), 6).as("waste_frac"))

  /** Size-balanced export sharding — assign every document to one of
    * `numShards` output shards so shard SIZE TOTALS come out near-equal
    * (WebDataset-style tar-shard export, where a fat shard straggles the
    * whole training input pipeline; the md5 sharding above balances COUNTS
    * only, which skewed document lengths defeat).
    *
    * Deterministic boustrophedon (snake) assignment over the global
    * `(size DESC, id)` order: rank r goes to shard `r % N` on even passes
    * and `N−1−(r % N)` on odd passes, so each full down-and-back cycle
    * hands every shard one large-ish and one small-ish document — the
    * classic zigzag balance for sorted items (max−min total bounded by one
    * item's size per incomplete cycle, in practice ≪ 1%). Exact, rerun-
    * and partitioning-stable, and cheap: no greedy state, no driver loop.
    *
    * The global rank is the [[SuffixArray]] two-phase scan shape: ONE slim
    * range exchange of `(id, size)` rows (never the payload), per-partition
    * `row_number`, bounded per-partition offsets broadcast back. Join the
    * result to the payload table on `idCol` and
    * `write.partitionBy("shard")` — the heavy bytes move once, in the
    * writer's keyed exchange.
    *
    * Output: `(idCol, sizeCol, rank, shard)`, one row per input document.
    * NULL sizes are rejected (a NULL would sort non-deterministically
    * between engines); size ties are broken by `idCol`.
    */
  def shardBySize(
      df: DataFrame,
      idCol: String,
      sizeCol: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy(col("_pid"))
      .orderBy(col(sizeCol).desc, col(idCol))
    val local = df
      .select(col(idCol), col(sizeCol))
      .filter(col(sizeCol).isNotNull && col(idCol).isNotNull)
      .repartitionByRange(nPart, col(sizeCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lr", row_number().over(w).cast("long"))
      // freeze partition ids: the offset table and the row ranks must see
      // the SAME physical layout (the prefixSums discipline)
      .localCheckpoint()
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    val r = col("_off") + col("_lr") - 1L
    val fwd = pmod(r, lit(numShards.toLong))
    val snake = when(pmod(floor(r / lit(numShards.toLong)).cast("long"), lit(2L)) === 0L,
      fwd).otherwise(lit(numShards.toLong - 1L) - fwd)
    local.join(broadcast(offsets), Seq("_pid"))
      .select(col(idCol), col(sizeCol), r.as("rank"), snake.as("shard"))
  }

  /** Per-shard rollup of [[shardBySize]]: `(shard, n_docs, total_size)` —
    * the balance report an export job logs (and a gate thresholds on).
    */
  def shardReport(assigned: DataFrame, sizeCol: String): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(sizeCol)).as("total_size"))
}

