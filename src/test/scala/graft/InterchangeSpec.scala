package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Interchange

/** ORC and JSON-lines interchange: lossless round-trips, ORC predicate
  * pushdown reaching the scan, explicit-schema JSONL restoring types and
  * tolerating ragged records.
  */
class InterchangeSpec extends SparkSpec {

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("ORC round-trip is lossless and pushes predicates to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    Interchange.writeOrc(docs, dir)
    val back = Interchange.readOrc(spark, dir)
    assert(back.schema === docs.schema)
    assert(back.collect().map(_.toSeq).toSet === docs.collect().map(_.toSeq).toSet)

    val plan = back.filter(col("doc_id") > 100).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
    assert(plan.contains("ReadSchema") && !plan.contains("text"),
      s"column pruning must drop the text column:\n$plan")
  }

  test("partitioned ORC writes prune partitions on read") {
    val dir = Files.createTempDirectory("graft_orc_part").toString + "/t"
    Interchange.writeOrc(docs, dir, partitionBy = Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1)
    val one = Interchange.readOrc(spark, dir).filter(col("lang") === "en")
    val expected = docs.filter(col("lang") === "en").count()
    assert(one.count() === expected)
    val scan = one.queryExecution.executedPlan.toString
    assert(!scan.contains("lang=de"), "partition pruning must drop other lang dirs")
  }

  test("JSONL round-trip with explicit schema restores rows and types") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/t"
    Interchange.writeJsonl(docs, dir)
    val back = Interchange.readJsonl(spark, dir, docs.schema)
    assert(back.schema === docs.schema)
    assert(back.collect().map(_.toSeq).toSet === docs.collect().map(_.toSeq).toSet)
  }

  test("ragged JSONL records surface missing fields as nulls") {
    val dir = Files.createTempDirectory("graft_jsonl_ragged").toString
    Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "full", "lang": "en", "source": "s", "n_chars": 4}""",
        """{"doc_id": 2, "text": "no lang"}""",
        """{"doc_id": 3, "extra": "ignored", "text": "x"}"""))
    val back = Interchange.readJsonl(spark, dir, docs.schema)
    assert(back.count() === 3)
    val r2 = back.filter(col("doc_id") === 2).head()
    assert(r2.getAs[String]("lang") == null && r2.getAs[String]("text") === "no lang")
    assert(!back.schema.fieldNames.contains("extra"))
  }
}
