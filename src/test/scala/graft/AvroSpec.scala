package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Avro

/** Avro container-file interchange on avro-core/avro-mapred (no spark-avro
  * on this classpath): full-fidelity round-trips across the supported type
  * surface, header-driven schema inference, split-parallel reads, and loud
  * refusals outside the v1 contract.
  */
class AvroSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_avro").toString + "/t"

  test("documents round-trip is row-exact with inferred schema") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val dir = tmp()
    Avro.writeAvro(docs, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    // exact content: anti-joins empty both ways
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("full type surface round-trips: nulls, nested struct, array, map, date, timestamp, binary") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.5), Seq(1, 2, 3), Map("x" -> 1L),
        Array[Byte](1, 2, 3), Some(("in", 7))),
      (2L, None, None, Seq.empty[Int], Map.empty[String, Long],
        Array.emptyByteArray, None))
      .toDF("id", "s", "d", "arr", "m", "bin", "nested")
      .withColumn("dt", to_date(lit("2024-02-29")))
      .withColumn("ts", to_timestamp(lit("2024-02-29 12:34:56.123456")))
      .withColumn("f", lit(1.25f))
      .withColumn("b", col("id") % 2 === 0)
    val dir = tmp()
    Avro.writeAvro(df, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    // set ops refuse MAP columns; compare via sorted-entry projection
    def comparable(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("m", array_sort(map_entries(col("m"))))
    assert(comparable(back).exceptAll(comparable(df)).isEmpty &&
      comparable(df).exceptAll(comparable(back)).isEmpty)
    val r = back.filter(col("id") === 1L).head()
    assert(r.getAs[Row]("nested").getInt(1) == 7)
    assert(r.getAs[Map[String, Long]]("m") == Map("x" -> 1L))
    assert(r.getAs[java.sql.Date]("dt").toString == "2024-02-29")
  }

  test("reads are split-parallel: one writer partition per container file, all files read") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").repartition(4)
    val dir = tmp()
    Avro.writeAvro(docs, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.rdd.getNumPartitions >= 4, "expected at least one split per container file")
    assert(back.count() == docs.count())
  }

  test("schema conversion: catalyst -> avro -> catalyst is the identity on the supported surface") {
    val st = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true),
      StructField("c", ArrayType(DoubleType, containsNull = true), nullable = true),
      StructField("d", MapType(StringType, IntegerType, valueContainsNull = false), nullable = true),
      StructField("e", StructType(Seq(
        StructField("x", BooleanType, nullable = true),
        StructField("y", BinaryType, nullable = false))), nullable = true),
      StructField("f", DateType, nullable = true),
      StructField("g", TimestampType, nullable = true),
      StructField("h", FloatType, nullable = false)))
    assert(Avro.toCatalystType(Avro.toAvroSchema(st)) == st)
  }

  test("same-named nested structs with different shapes round-trip (path-qualified record names)") {
    import spark.implicits._
    // p.x and q.x share the field name but not the shape — unqualified
    // record names would collide inside one Avro schema
    val df = Seq((1L, (("a", 2L)), ((3.5, true))))
      .toDF("id", "p", "q")
      .select(col("id"),
        struct(col("p").as("x")).as("p"),
        struct(col("q").as("x")).as("q"))
    val dir = tmp()
    Avro.writeAvro(df, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    val r = back.head()
    assert(r.getAs[Row]("p").getAs[Row]("x").getString(0) == "a")
    assert(r.getAs[Row]("q").getAs[Row]("x").getBoolean(1))
  }

  test("refusals: decimal out of contract; multi-branch unions refused on read") {
    val dec = StructType(Seq(StructField("d", DecimalType(10, 2), nullable = true)))
    val e = intercept[IllegalArgumentException](Avro.toAvroSchema(dec))
    assert(e.getMessage.contains("unsupported type"))
    val union = org.apache.avro.SchemaBuilder.record("r").fields()
      .name("u").`type`(org.apache.avro.Schema.createUnion(
        org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT),
        org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING)))
      .noDefault().endRecord()
    val e2 = intercept[IllegalArgumentException](Avro.toCatalystType(union))
    assert(e2.getMessage.contains("union"))
  }

  test("explicit-schema read projects a column subset (absent fields null)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val dir = tmp()
    Avro.writeAvro(docs, dir)
    val narrow = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("not_there", StringType, nullable = true)))
    val back = Avro.readAvro(spark, dir, Some(narrow))
    assert(back.schema == narrow)
    assert(back.count() == docs.count())
    assert(back.filter(col("not_there").isNotNull).count() == 0)
    assert(back.select("lang").distinct().count() ==
      docs.select("lang").distinct().count())
  }
}
