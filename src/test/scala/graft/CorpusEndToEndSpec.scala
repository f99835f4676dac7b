package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bpe, Curate, Pack, Sampling}

/** The full LLM training-data pipeline, composed end-to-end the way a user
  * would run it: curate (quality + language + exact/near dedup) → split
  * (train/val) → epoch shuffle → BPE tokenize to ids → pack into
  * fixed-budget sequences. The assertions are the pipeline's contracts:
  * monotone stage narrowing, no leakage between splits, token conservation
  * through packing, and bit-identical reruns (every stage is md5-derived).
  */
class CorpusEndToEndSpec extends SparkSpec {

  test("documents → curate → split → shuffle → tokenize → pack, deterministic end to end") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val nDocs = docs.count()

    // 1. curate: flags surfaced per doc, keep = AND of all gates
    val flags = Curate.decide(docs, "doc_id", "text", minQuality = 0.3, sampleRate = 0.9)
    assert(flags.count() === nDocs, "curation must flag every doc, not pre-filter")
    val kept = flags.filter(col("keep")).select("doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept < nDocs)
    val corpus = docs.join(kept, "doc_id")

    // 2. train/val split: disjoint, exhaustive over the kept corpus
    val splits = Sampling.split(corpus, "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
    assert(splits.count() === nKept)
    val train = splits.filter(col("split") === "train")
    val val_ = splits.filter(col("split") === "val")
    assert(train.count() + val_.count() === nKept)
    assert(train.join(val_, "doc_id").count() === 0, "splits must not leak")

    // 3. epoch shuffle over train: exact permutation
    val shuffled = Sampling.epochShuffle(train, "doc_id", epoch = 1L)
    val nTrain = train.count()
    assert(shuffled.select("pos").collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until nTrain))

    // 4. tokenize: learn on train ONLY (the val set must not shape the
    // vocabulary), byte-level so val text cannot go out-of-vocabulary
    val merges = Bpe.learnBatched(train, "text", numMerges = 32, batchSize = 8,
      byteLevel = true)
    val vocab = Bpe.vocabulary(train, "text", merges, byteLevel = true)
    val encTrain = Bpe.encodeIds(shuffled, "doc_id", "text", merges, vocab,
      unkId = -1L, byteLevel = true)
    val encVal = Bpe.encodeIds(val_, "doc_id", "text", merges, vocab,
      unkId = -1L, byteLevel = true)
    assert(encTrain.count() === nTrain)
    assert(encTrain.select(explode(col("token_ids"))).filter(col("col") === -1L).count() === 0)
    assert(encVal.select(explode(col("token_ids"))).filter(col("col") === -1L).count() === 0,
      "byte-level vocabulary must cover unseen val text")

    // 5. pack: token conservation through the layout
    val packed = Pack.packTokenIds(encTrain, "doc_id", "token_ids",
      budget = 256, numShards = 4)
    val totalTokens = encTrain.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(packed.agg(sum("seg_tokens")).collect()(0).getLong(0) === totalTokens)

    // 6. the WHOLE pipeline reruns bit-identically (md5 end to end)
    val rerun = Pack.packTokenIds(
      Bpe.encodeIds(
        Sampling.epochShuffle(
          Sampling.split(docs.join(
              Curate.decide(docs, "doc_id", "text", minQuality = 0.3, sampleRate = 0.9)
                .filter(col("keep")).select("doc_id"), "doc_id"),
            "doc_id", Seq("train" -> 0.9, "val" -> 0.1)).filter(col("split") === "train"),
          "doc_id", epoch = 1L),
        "doc_id", "text", merges, vocab, unkId = -1L, byteLevel = true),
      "doc_id", "token_ids", budget = 256, numShards = 4)
    val a = packed.select("shard", "seq_idx", "doc_id", "seq_offset", "seg_tokens")
      .collect().map(_.toSeq).toSet
    val b = rerun.select("shard", "seq_idx", "doc_id", "seq_offset", "seg_tokens")
      .collect().map(_.toSeq).toSet
    assert(a === b, "pipeline rerun must be bit-identical")
  }
}
