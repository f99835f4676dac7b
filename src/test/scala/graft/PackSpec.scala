package graft

import org.apache.spark.sql.functions._

import graft.ops.Pack

/** Sequence-packing invariants: token conservation, budget discipline, and
  * layout determinism under arbitrary input partitioning.
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 100
  private def docs = spark.read.parquet(sf("documents"))

  test("packConcat: every token exactly once, every non-final sequence exactly full") {
    val d = docs
    val packed = Pack.packConcat(d, "doc_id", "text", budget, numShards = 4)
    packed.cache()

    // conservation: per doc, segment tokens sum to the doc's token count and
    // segments reassemble the tokenized text in order
    val perDoc = packed.groupBy("doc_id")
      .agg(sum("seg_tokens").as("got"),
        concat_ws(" ", array_sort(collect_list(struct(
          col("shard"), col("seq_idx"), col("seq_offset"), col("seg_text"))))
          .getField("seg_text")).as("joined"))
    val truth = d.select(col("doc_id"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("nt"),
      concat_ws(" ", split(trim(lower(col("text"))), "\\s+")).as("norm"))
    val bad = perDoc.join(truth, "doc_id")
      .filter(col("got") =!= col("nt") || col("joined") =!= col("norm"))
    assert(bad.count() == 0, "token loss or reorder within a document")

    // budget discipline: every sequence except each shard's last is exactly
    // `budget` tokens; the last is (0, budget]
    val seqSizes = packed.groupBy("shard", "seq_idx").agg(sum("seg_tokens").as("n"))
    val lastSeq = seqSizes.groupBy("shard").agg(max("seq_idx").as("last"))
    val nonFinal = seqSizes.join(lastSeq, "shard").filter(col("seq_idx") < col("last"))
    assert(nonFinal.filter(col("n") =!= budget.toLong).count() == 0)
    assert(seqSizes.filter(col("n") <= 0 || col("n") > budget.toLong).count() == 0)

    // segment offsets tile each sequence contiguously from 0
    val tiles = packed.groupBy("shard", "seq_idx")
      .agg(min("seq_offset").as("lo"), sum("seg_tokens").as("n"),
        max(col("seq_offset") + col("seg_tokens")).as("hi"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n"))
    assert(tiles.count() == 0, "segments do not tile their sequence")
    packed.unpersist()
  }

  test("packGreedy: budget respected, docs never split, layout deterministic") {
    val packed = Pack.packGreedy(docs, "doc_id", "text", budget, numShards = 4)
    packed.cache()

    // every doc appears exactly once (no splitting, no loss)
    assert(packed.select("doc_id").distinct().count() == packed.count())
    assert(packed.count() == docs.count())

    // a sequence only exceeds the budget when it holds a single oversized doc
    val over = packed.groupBy("shard", "seq_idx")
      .agg(sum("nt").as("n"), count(lit(1)).as("k"))
      .filter(col("n") > budget.toLong && col("k") > 1)
    assert(over.count() == 0, "multi-doc sequence over budget")

    // sequence ids are dense from 0 per shard (greedy never skips a bin)
    val dense = packed.groupBy("shard")
      .agg(min("seq_idx").as("lo"), max("seq_idx").as("hi"),
        count_distinct(col("seq_idx")).as("k"))
      .filter(col("lo") =!= 0 || col("k") =!= col("hi") + 1)
    assert(dense.count() == 0, "non-dense sequence numbering")
    packed.unpersist()
  }

  test("packing layout is invariant to input partitioning and rerun") {
    val a = Pack.packConcat(docs, "doc_id", "text", budget, numShards = 4)
      .collect().map(_.toSeq).toSet
    val b = Pack.packConcat(docs.repartition(7), "doc_id", "text", budget, numShards = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val g1 = Pack.packGreedy(docs, "doc_id", "text", budget, numShards = 4)
      .collect().map(_.toSeq).toSet
    val g2 = Pack.packGreedy(docs.repartition(7).sortWithinPartitions("n_chars"),
      "doc_id", "text", budget, numShards = 4)
      .collect().map(_.toSeq).toSet
    assert(g1 == g2)
  }

  test("packTokenIds: id conservation, exact-full sequences, empty docs drop, layout-stable") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(80)
      .unionByName(Seq((90001L, ""), (90002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("x"))
        .withColumn("n_chars", lit(0L)).select("doc_id", "text", "lang", "source", "n_chars"))
    val merges = graft.ops.Bpe.learn(docs, "text", 8, byteLevel = true)
    val vocab = graft.ops.Bpe.vocabulary(docs, "text", merges, byteLevel = true)
    val enc = graft.ops.Bpe.encodeIds(docs, "doc_id", "text", merges, vocab, byteLevel = true)
    val packed = Pack.packTokenIds(enc, "doc_id", "token_ids", budget = 64, numShards = 4)

    // conservation: per doc, concatenating its segments in (shard, seq_idx,
    // seq_offset) order reproduces token_ids exactly
    val orig = enc.select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val segs = packed.collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1), r.getLong(3), r.getSeq[Long](5))))
      .groupBy(_._1).map { case (id, xs) =>
        id -> xs.map(_._2).sortBy(x => (x._1, x._2, x._3)).flatMap(_._4).toSeq
      }
    segs.foreach { case (id, ids) => assert(ids === orig(id), s"doc $id id conservation") }
    // empty/null docs pack nowhere (and emit NO phantom descending segments)
    assert(!segs.contains(90001L) && !segs.contains(90002L))
    assert(packed.filter(col("seq_idx") < 0 || col("seg_tokens") <= 0).count() === 0)

    // every sequence except each shard's last is exactly full
    val seqTotals = packed.groupBy("shard", "seq_idx")
      .agg(sum("seg_tokens").as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lastPerShard = seqTotals.keys.groupBy(_._1).map { case (s, ks) => s -> ks.map(_._2).max }
    seqTotals.foreach { case ((s, q), n) =>
      if (q != lastPerShard(s)) assert(n === 64L, s"sequence ($s,$q) must be exactly full")
      else assert(n <= 64L)
    }

    // layout is partitioning-stable
    val repacked = Pack.packTokenIds(
      enc.repartition(7, col("doc_id")), "doc_id", "token_ids", budget = 64, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(repacked === packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("packTokenIdsWithMask: mask slices stay aligned to their ids and conserve exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ids are positions, masks alternate with a doc-specific phase — any
    // misalignment after packing is visible as a broken (id, mask) pair
    val docs = (1L to 40L).map { d =>
      val n = (d % 13 + 1).toInt
      (d, (0 until n).map(i => d * 100 + i), (0 until n).map(i => (i + d) % 2 == 0))
    }.toDF("doc_id", "ids", "mask")
    val packed = graft.ops.Pack
      .packTokenIdsWithMask(docs, "doc_id", "ids", "mask", budget = 16, numShards = 4)
    val segs = packed
      .select("doc_id", "seq_idx", "seg_ids", "seg_mask")
      .as[(Long, Long, Seq[Long], Seq[Boolean])].collect()
    // alignment: every (id, mask) pair matches the source construction
    segs.foreach { case (d, _, ids, mask) =>
      assert(ids.length == mask.length)
      ids.zip(mask).foreach { case (id, m) =>
        val i = id - d * 100
        assert(m == ((i + d) % 2 == 0), s"doc $d token $i mask misaligned")
      }
    }
    // conservation: concatenating a doc's mask slices in seq order
    // reconstructs its original mask exactly
    val rebuilt = segs.groupBy(_._1).map { case (d, ss) =>
      d -> ss.sortBy(_._2).flatMap(_._4).toSeq
    }
    val orig = docs.select("doc_id", "mask").as[(Long, Seq[Boolean])].collect().toMap
    assert(rebuilt.keySet == orig.keySet)
    rebuilt.foreach { case (d, m) => assert(m == orig(d), s"doc $d mask not conserved") }
    // shared columns identical to packTokenIds
    val plain = graft.ops.Pack
      .packTokenIds(docs, "doc_id", "ids", budget = 16, numShards = 4)
      .select("shard", "seq_idx", "doc_id", "seq_offset", "seg_tokens", "seg_ids")
      .collect().map(_.toString).sorted.toSeq
    val shared = packed
      .select("shard", "seq_idx", "doc_id", "seq_offset", "seg_tokens", "seg_ids")
      .collect().map(_.toString).sorted.toSeq
    assert(shared == plain)
  }

  test("packTokenIdsWithMask refuses a mask whose length disagrees with the ids") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1L, 2L, 3L), Seq(true, false)))
      .toDF("doc_id", "ids", "mask")
    val e = intercept[Exception] {
      graft.ops.Pack
        .packTokenIdsWithMask(bad, "doc_id", "ids", "mask", budget = 8, numShards = 2)
        .collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("length mismatch"), s"unexpected error chain: $messages")
  }

  test("lengthBucketBatches: smallest fitting edge, overlong drops, batches bounded") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c"),                       // 3 tokens -> bucket 4
      (2L, "a b c d"),                     // 4 tokens -> bucket 4 (edge inclusive)
      (3L, "a b c d e"),                   // 5 tokens -> bucket 8
      (4L, (1 to 20).map(_ => "t").mkString(" ")), // 20 tokens -> over last edge: DROPS
      (5L, "x"), (6L, "y z"))              // bucket 4
      .toDF("doc_id", "text")
    val got = Pack.lengthBucketBatches(d, "doc_id", "text",
      edges = Seq(4L, 8L), batchSize = 2)
    val rows = got.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(!rows.contains(4L), "doc longer than the last edge must drop")
    assert(rows(1L)._2 == 4L && rows(2L)._2 == 4L && rows(3L)._2 == 8L)
    assert(rows(5L)._2 == 4L && rows(6L)._2 == 4L)
    // bucket 4 holds 4 docs in batches of 2: two full batches, positions 0/1
    val b4 = rows.values.filter(_._2 == 4L).toSeq
    assert(b4.map(_._3).distinct.sorted == Seq(0L, 1L), "two batches in bucket 4")
    assert(b4.groupBy(_._3).values.forall(_.size == 2), "every bucket-4 batch is full")
    assert(b4.map(_._4).forall(p => p == 0L || p == 1L))
    // deterministic under partitioning
    val again = Pack.lengthBucketBatches(d.repartition(7), "doc_id", "text",
      edges = Seq(4L, 8L), batchSize = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(again == got.collect().map(_.toString).sorted.toSeq)
  }

  test("shardBySize: exact snake over (size desc, id), balanced, layout-stable") {
    val sized = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"))
    val n = 8
    val got = Pack.shardBySize(sized, "doc_id", "n_chars", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // 1. exact equality with a driver-recomputed snake
    val expected = sized.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, c) => (-c, id) }
      .zipWithIndex
      .map { case ((id, c), r) =>
        val fwd = r % n
        (id, c, r.toLong, if ((r / n) % 2 == 0) fwd.toLong else (n - 1 - fwd).toLong)
      }.toSet
    assert(got.toSet == expected)

    // 2. balance: every shard's total within one max-item of every other
    val totals = got.groupBy(_._4).view.mapValues(_.map(_._2).sum).values.toSeq
    val maxItem = got.map(_._2).max
    assert(totals.max - totals.min <= maxItem,
      s"shard totals spread ${totals.max - totals.min} exceeds one item ($maxItem)")
    // and counts differ by at most one snake row
    val counts = got.groupBy(_._4).view.mapValues(_.size).values.toSeq
    assert(counts.max - counts.min <= 1)

    // 3. partitioning invariance
    val one = Pack.shardBySize(sized.repartition(1), "doc_id", "n_chars", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(one == expected)

    // 4. numShards = 1 puts everything in shard 0
    assert(Pack.shardBySize(sized, "doc_id", "n_chars", 1)
      .select("shard").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))

    // 5. NULL sizes are rejected, not sorted somewhere arbitrary
    val withNull = Seq((900001L, Some(5L)), (900002L, None))
      .toDF("doc_id", "n_chars")
    assert(Pack.shardBySize(withNull, "doc_id", "n_chars", 2).count() == 1)

    // 6. report rolls up the same assignment
    val rep = Pack.shardReport(
      Pack.shardBySize(sized, "doc_id", "n_chars", n), "n_chars")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expTotals = expected.groupBy(_._4)
      .map { case (s, rows) => s -> ((rows.size.toLong, rows.toSeq.map(_._2).sum)) }
    assert(rep == expTotals)
  }

  test("paddingWaste: padded = rows x max_len, waste fraction exact") {
    import spark.implicits._
    val assigned = Seq(
      // one batch: lengths 3 and 4 -> padded 8, actual 7, waste 1/8
      (1L, 3L, 4L, 0L, 0L), (2L, 4L, 4L, 0L, 1L),
      // singleton batch: zero waste
      (3L, 5L, 8L, 0L, 0L))
      .toDF("doc_id", "n_tokens", "bucket", "batch_idx", "pos_in_batch")
    val got = Pack.paddingWaste(assigned)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got((4L, 0L)) == ((2L, 4L, 7L, 8L, 0.125)))
    assert(got((8L, 0L)) == ((1L, 5L, 5L, 5L, 0.0)))
  }
}
