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

  test("refusals: multi-branch unions refused on read") {
    val union = org.apache.avro.SchemaBuilder.record("r").fields()
      .name("u").`type`(org.apache.avro.Schema.createUnion(
        org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT),
        org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING)))
      .noDefault().endRecord()
    val e2 = intercept[IllegalArgumentException](Avro.toCatalystType(union))
    assert(e2.getMessage.contains("union"))
  }

  test("decimal round-trips at several precisions incl. >18 digits and negatives") {
    val df = spark.sql("""
      SELECT * FROM VALUES
        (CAST( 12.34   AS DECIMAL(10,2)), CAST( 0.000000001 AS DECIMAL(20,9)),
         CAST( 12345678901234567890.12345 AS DECIMAL(25,5)), CAST(7 AS DECIMAL(3,0))),
        (CAST(-12.34   AS DECIMAL(10,2)), CAST(-123456789.987654321 AS DECIMAL(20,9)),
         CAST(-12345678901234567890.12345 AS DECIMAL(25,5)), CAST(-999 AS DECIMAL(3,0))),
        (CAST( 0.01    AS DECIMAL(10,2)), CAST(0 AS DECIMAL(20,9)),
         NULL, NULL)
      AS t(a, b, c, d)""")
    val dir = tmp()
    Avro.writeAvro(df, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // schema conversion is the identity for decimals too
    assert(Avro.toCatalystType(Avro.toAvroSchema(df.schema)) == df.schema)
  }

  test("externally-written timestamp-millis and fixed-decimal files decode exactly") {
    import org.apache.avro.{LogicalTypes, Schema}
    import org.apache.avro.generic.GenericData
    // hand-write a container file the way a foreign writer would: long +
    // timestamp-millis, fixed(4) + decimal(9,2) — neither is what writeAvro
    // emits, so this pins the read-side logical-type handling
    val millisS = LogicalTypes.timestampMillis().addToSchema(Schema.create(Schema.Type.LONG))
    val fixedS = LogicalTypes.decimal(9, 2).addToSchema(
      Schema.createFixed("dec92", null, "ext", 4))
    val rec = Schema.createRecord("ext_rec", null, "ext", false, java.util.List.of(
      new Schema.Field("ts", millisS, null, null.asInstanceOf[Object]),
      new Schema.Field("amt", fixedS, null, null.asInstanceOf[Object])))
    val dir = tmp()
    new java.io.File(dir).mkdirs()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](rec))
    w.create(rec, new java.io.File(dir, "part-00000.avro"))
    val r1 = new GenericData.Record(rec)
    r1.put("ts", 1709210096123L) // 2024-02-29 12:34:56.123 UTC, in MILLIS
    // 1234.56 at scale 2 → unscaled 123456, big-endian two's complement in 4 bytes
    r1.put("amt", new GenericData.Fixed(fixedS,
      java.nio.ByteBuffer.allocate(4).putInt(123456).array()))
    w.append(r1)
    val r2 = new GenericData.Record(rec)
    r2.put("ts", -1000L) // pre-epoch millis
    r2.put("amt", new GenericData.Fixed(fixedS,
      java.nio.ByteBuffer.allocate(4).putInt(-250).array())) // -2.50
    w.append(r2)
    w.close()
    val back = Avro.readAvro(spark, dir).orderBy(desc("ts"))
    assert(back.schema == StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("amt", DecimalType(9, 2), nullable = false))))
    val rows = back.collect()
    assert(rows(0).getAs[java.sql.Timestamp]("ts").getTime == 1709210096123L,
      "millis timestamp must not be read as micros (1000x too small)")
    assert(rows(0).getAs[java.math.BigDecimal]("amt") == new java.math.BigDecimal("1234.56"))
    assert(rows(1).getAs[java.sql.Timestamp]("ts").getTime == -1000L)
    assert(rows(1).getAs[java.math.BigDecimal]("amt") == new java.math.BigDecimal("-2.50"))
  }

  test("written container files actually carry the snappy codec") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val dir = tmp()
    Avro.writeAvro(docs, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/part-*")).head.getPath
    val in = new org.apache.avro.mapred.FsInput(part, conf)
    val r = new org.apache.avro.file.DataFileReader(
      in, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try assert(r.getMetaString("avro.codec") == "snappy",
      "codec setting is ignored unless Hadoop output compression is enabled")
    finally r.close()
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
