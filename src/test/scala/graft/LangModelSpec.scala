package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, LangModel, TextAnalysis}

/** Persisted n-gram LM artifact: fit/save/load identity against the inline
  * scorers, EXACT incremental append (counts are mergeable sums), compaction,
  * geometry refusals, and the streaming fold twin.
  */
class LangModelSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lm_spec_").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("save → load → score equals the inline scorers exactly") {
    val train = docs.filter(col("doc_id") % 3 =!= 0)
    val vocab = TextAnalysis.vocabStats(train, "doc_id", "text").count()
    val path = tmp()
    LangModel.save(LangModel.fit(train, "doc_id", "text"), path)
    val lm = LangModel.load(spark, path)

    assert(LangModel.vocabSize(lm) == vocab,
      "artifact c1 row count must equal the train vocabulary size")
    assert(rows(LangModel.scoreKneserNey(lm, docs, "doc_id", "text")) ==
      rows(TextAnalysis.kneserNeyScore(
        train, "doc_id", "text", docs, "doc_id", "text", vocab)))
    assert(rows(LangModel.scoreStupidBackoff(lm, docs, "doc_id", "text")) ==
      rows(TextAnalysis.stupidBackoffScore(
        train, "doc_id", "text", docs, "doc_id", "text", vocab)))
  }

  test("append ≡ rebuild rank-for-rank: count tables AND scores") {
    val all = docs.filter(col("doc_id") % 3 =!= 0)
    val first = all.filter(col("doc_id") % 2 === 0)
    val second = all.filter(col("doc_id") % 2 =!= 0)
    val path = tmp()
    LangModel.save(LangModel.fit(first, "doc_id", "text"), path)
    LangModel.append(spark, path, second, "doc_id", "text")

    val appended = LangModel.load(spark, path)
    val rebuilt = LangModel.fit(all, "doc_id", "text")
    assert(rows(appended.c1) == rows(rebuilt.c1), "unigram counts diverge")
    assert(rows(appended.c2) == rows(rebuilt.c2), "bigram counts diverge")
    assert(rows(appended.c3) == rows(rebuilt.c3), "trigram counts diverge")
    assert(rows(LangModel.scoreKneserNey(appended, docs, "doc_id", "text")) ==
      rows(LangModel.scoreKneserNey(rebuilt, docs, "doc_id", "text")))
  }

  test("double append stays exact and an empty-batch append is a no-op") {
    val all = docs.filter(col("doc_id") % 3 =!= 0)
    val parts = Seq(
      all.filter(col("doc_id") % 3 === 1),
      all.filter(col("doc_id") % 3 === 2))
    val path = tmp()
    LangModel.save(LangModel.fit(parts.head, "doc_id", "text"), path)
    LangModel.append(spark, path, parts(1), "doc_id", "text")
    LangModel.append(spark, path, all.filter(lit(false)), "doc_id", "text")
    val lm = LangModel.load(spark, path)
    assert(rows(lm.c2) == rows(LangModel.fit(all, "doc_id", "text").c2))
  }

  test("compactTo folds the delta log to one row per gram, same model") {
    val all = docs.filter(col("doc_id") % 4 === 0)
    val path = tmp()
    LangModel.save(LangModel.fit(all.limit(30), "doc_id", "text"), path)
    LangModel.append(spark, path, all, "doc_id", "text")
    val rawRows = spark.read.parquet(s"$path/c2").count()

    val dest = tmp() + "/compacted"
    LangModel.compactTo(spark, path, dest)
    val compacted = spark.read.parquet(s"$dest/c2")
    assert(compacted.count() ==
      compacted.select("w1", "w2").distinct().count(),
      "compacted table must hold one row per gram")
    assert(compacted.count() <= rawRows)
    assert(rows(LangModel.load(spark, dest).c2) ==
      rows(LangModel.load(spark, path).c2))
    intercept[IllegalArgumentException] {
      LangModel.compactTo(spark, path, path)
    }
  }

  test("load and append refuse a directory that is not an LM artifact") {
    val bare = tmp()
    val eLoad = intercept[IllegalArgumentException] {
      LangModel.load(spark, bare)
    }
    assert(eLoad.getMessage.contains("LangModel.save"))
    intercept[IllegalArgumentException] {
      LangModel.append(spark, bare, docs.limit(1), "doc_id", "text")
    }
  }

  test("streaming two-wave fold via append ≡ batch fit on the union") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = docs.filter(col("doc_id") % 5 === 1).limit(40)
      .select(col("doc_id"), col("text")).collect()
      .map(r => Dedup.DocChunk(r.getLong(0), r.getString(1)))
    val (w1, w2) = all.splitAt(all.length / 2)

    val path = tmp()
    // bootstrap an empty artifact so every micro-batch is a plain append
    LangModel.save(
      LangModel.fit(docs.filter(lit(false)), "doc_id", "text"), path)

    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val q = source.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        LangModel.append(batch.sparkSession, path, batch, "doc_id", "text")
      }
      .start()
    try {
      source.addData(w1.toIndexedSeq); q.processAllAvailable()
      source.addData(w2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = LangModel.load(spark, path)
    val batchLm = LangModel.fit(
      spark.createDataset(all.toIndexedSeq).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(rows(streamed.c2) == rows(batchLm.c2),
      "streamed count fold diverges from the batch fit")
    assert(rows(streamed.c3) == rows(batchLm.c3))
  }
}
