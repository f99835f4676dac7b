package graft

import org.apache.spark.sql.functions._

import graft.ops.Decontaminate

class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
  private lazy val train = docs.filter(col("doc_id") % 5 =!= 0)
  private lazy val eval = docs.filter(col("doc_id") % 5 === 0)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("indexed decontamination == the direct broadcast-probe scan") {
    val direct = asSet(Decontaminate.ngramOverlap(
      train, "doc_id", "text", eval, "doc_id", "text", n = 2, threshold = 0.3))
    val idx = Decontaminate.buildShingleIndex(train, "doc_id", "text", n = 2, buckets = 16)
    val indexed = asSet(Decontaminate.ngramOverlapIndexed(
      idx, eval, "doc_id", "text", threshold = 0.3))
    assert(direct.nonEmpty, "fixture produced no contamination pairs — test is vacuous")
    assert(indexed == direct)
  }

  test("persisted index: load == build, wrong/bare dirs refuse loudly") {
    val idx = Decontaminate.buildShingleIndex(train, "doc_id", "text", n = 2, buckets = 16)
    val path = java.nio.file.Files.createTempDirectory("graft_shix_").toString
    Decontaminate.saveShingleIndex(idx, path)
    val loaded = Decontaminate.loadShingleIndex(spark, path)
    assert(loaded.n == 2 && loaded.buckets == 16)
    val viaLoaded = asSet(Decontaminate.ngramOverlapIndexed(
      loaded, eval, "doc_id", "text", threshold = 0.3))
    val viaBuilt = asSet(Decontaminate.ngramOverlapIndexed(
      idx, eval, "doc_id", "text", threshold = 0.3))
    assert(viaLoaded == viaBuilt)
    // a bare parquet dir without the sidecar must refuse, not guess geometry
    val bare = java.nio.file.Files.createTempDirectory("graft_shix_bare_").toString
    idx.relation.write.mode("overwrite").parquet(bare)
    val e = intercept[IllegalArgumentException] {
      Decontaminate.loadShingleIndex(spark, bare)
    }
    assert(e.getMessage.contains("_shingle_meta.json"))
  }

  test("exactSubstringOverlap: benchmark runs flag, corpus-internal repeats do NOT; clean cuts them") {
    val bench = Seq(
      (100L, "the held out benchmark item with its exact answer text here xx"))
      .toDF("doc_id", "text")
    val shared = "the held out benchmark item with its exact an" // 46 chars of bench
    val innerDup = "corpus internal repeated filler run that must never flag!!"
    val corpus = Seq(
      (1L, s"some prefix then $shared and a suffix"),     // contaminated
      (2L, s"$innerDup aaaa $innerDup"),                  // internal repeat only
      (3L, "a perfectly clean document with nothing shared at all ok"),
      (4L, shared))                                       // contaminated wholesale
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dcb_").toString
    graft.ops.SuffixArray.saveCrossDocHashes(bench, "doc_id", "text", minLen = 30, dir)

    val spans = Decontaminate.exactSubstringOverlap(corpus, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = spans.groupBy(_._1)
    assert(byDoc.keySet == Set(1L, 4L),
      s"only benchmark-overlapping docs may flag (2's internal repeat must not): ${spans.toSeq}")
    // doc 1: the shared run starts at 17 and spans its full 46 chars
    assert(byDoc(1L).toSeq == Seq((1L, 17L, 17L + shared.length)))
    assert(byDoc(4L).toSeq == Seq((4L, 0L, shared.length.toLong)))

    // the removal composition: contaminated spans cut, clean docs byte-identical
    val cleaned = Decontaminate.exactSubstringClean(corpus, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cleaned(1L) == "some prefix then  and a suffix")
    assert(cleaned(4L) == "")
    assert(cleaned(2L) == s"$innerDup aaaa $innerDup", "internal repeats survive untouched")
    assert(cleaned(3L) == "a perfectly clean document with nothing shared at all ok")

    // the probe plan broadcasts the benchmark and never shuffles corpus text
    val plan = Decontaminate.exactSubstringOverlap(corpus, "doc_id", "text", dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
  }

  test("probing a tiny benchmark scans only its own bucket partitions") {
    val idx = Decontaminate.buildShingleIndex(train, "doc_id", "text", n = 2, buckets = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_shix_pr_").toString
    Decontaminate.saveShingleIndex(idx, path)
    val loaded = Decontaminate.loadShingleIndex(spark, path)
    // a one-document eval suite with a handful of shingles
    val tiny = eval.limit(1)
    val probed = Decontaminate.ngramOverlapIndexed(loaded, tiny, "doc_id", "text", 0.01)
    probed.collect()
    // the driver-computed eval buckets must reach the scan as partition
    // filters — the build-once / probe-each-new-benchmark payoff
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sh_bucket"),
      s"expected sh_bucket partition pruning in:\n$plan")
  }
}
