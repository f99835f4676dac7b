package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange built directly on avro-core +
  * avro-mapred — this classpath ships the Avro LIBRARY but not the
  * `spark-avro` DataSource module, so the format support lives here (the
  * pre-spark-avro Hadoop-InputFormat approach every large Spark shop used;
  * public API surface only).
  *
  * Scale shape: Avro container files are SPLITTABLE on their sync markers,
  * and `AvroKeyInputFormat` exposes exactly those splits — a 100 TB Avro
  * lake reads with block-level parallelism like parquet, not
  * file-at-a-time. Writes go through `AvroKeyOutputFormat` (one container
  * file per partition, snappy codec), so layout parallelism matches the
  * DataFrame's. Record conversion is per-task and allocation-conscious;
  * rows never cross a shuffle as GenericRecords (they are not
  * serializable — conversion happens inside the scan task).
  *
  * Type surface (both directions): boolean, int, long, float, double,
  * string, binary, date (int/`date`), timestamp (long/`timestamp-micros`
  * or `timestamp-millis` — externally-written millis files read back
  * correctly, scaled ×1000 to Catalyst micros), decimal(p,s) (written as
  * `bytes` + `decimal` logical type; read from `bytes` OR `fixed` +
  * `decimal`), arrays, string-keyed maps, nested structs; nullable ⇔
  * `union(null, T)`. Avro enum/fixed-without-decimal read as
  * string/binary. Multi-branch non-null unions are REFUSED loudly rather
  * than silently approximated.
  */
object Avro {

  // ---- schema conversion ------------------------------------------------

  /** Catalyst → Avro. Field names must be Avro-legal (`[A-Za-z_][A-Za-z0-9_]*`). */
  def toAvroSchema(schema: StructType, name: String = "record", ns: String = "graft"): Schema = {
    def field(dt: DataType, path: String): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(elem, containsNull) =>
        Schema.createArray(nullable(field(elem, s"$path.element"), containsNull))
      case MapType(StringType, v, valueContainsNull) =>
        Schema.createMap(nullable(field(v, s"$path.value"), valueContainsNull))
      case st: StructType => record(st, sanitize(path), ns)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported type for Avro interchange at $path: ${other.catalogString} " +
            "(exotic types are out of the v1 contract)")
    }
    def nullable(s: Schema, isNullable: Boolean): Schema =
      if (isNullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s
    def record(st: StructType, recName: String, recNs: String): Schema = {
      val fields = st.fields.map { f =>
        // record names must be unique per Avro schema: qualify nested
        // records by their FULL path (two different-shaped structs that
        // happen to share a field name at different depths would
        // otherwise collide)
        new Schema.Field(
          f.name, nullable(field(f.dataType, s"$recName.${f.name}"), f.nullable),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(recName, null, recNs, false, fields.toList.asJava)
    }
    record(schema, name, ns)
  }

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9_]", "_")

  /** Avro → Catalyst. `union(null, T)` reads as nullable T; any other union
    * is refused. Enum → string, fixed → binary.
    */
  def toCatalystType(schema: Schema): StructType = {
    def convert(s: Schema, path: String): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
        require(nonNull.size == 1,
          s"unsupported Avro union at $path: ${s.toString} — only union(null, T) reads")
        val (dt, _) = convert(nonNull.head, path)
        (dt, branches.size > nonNull.size)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT =>
        (if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
         else IntegerType, false)
      case Schema.Type.LONG =>
        val lt = Option(s.getLogicalType).map(_.getName)
        (if (lt.contains("timestamp-micros") || lt.contains("timestamp-millis")) TimestampType
         else LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
          case _ => (BinaryType, false)
        }
      case Schema.Type.ARRAY =>
        val (dt, n) = convert(s.getElementType, s"$path.element")
        (ArrayType(dt, n), false)
      case Schema.Type.MAP =>
        val (dt, n) = convert(s.getValueType, s"$path.value")
        (MapType(StringType, dt, n), false)
      case Schema.Type.RECORD =>
        (StructType(s.getFields.asScala.map { f =>
          val (dt, n) = convert(f.schema(), s"$path.${f.name()}")
          StructField(f.name(), dt, n)
        }.toSeq), false)
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro type at $path: $other")
    }
    convert(schema, "$") match {
      case (st: StructType, _) => st
      case (other, _) =>
        throw new IllegalArgumentException(s"top-level Avro schema must be a record, got $other")
    }
  }

  // ---- value conversion ---------------------------------------------------

  private def toAvroValue(v: Any, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (x: java.sql.Timestamp, TimestampType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(x)
    case (x: java.time.Instant, TimestampType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(x)
    case (x: java.sql.Date, DateType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(x)
    case (x: java.time.LocalDate, DateType) => x.toEpochDay.toInt
    case (x: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(x)
    // decimal → two's-complement unscaled bytes at the schema's scale
    // (the Avro `decimal` logical-type contract)
    case (x: java.math.BigDecimal, d: DecimalType) =>
      java.nio.ByteBuffer.wrap(x.setScale(d.scale).unscaledValue().toByteArray)
    case (x: scala.math.BigDecimal, d: DecimalType) =>
      java.nio.ByteBuffer.wrap(x.underlying().setScale(d.scale).unscaledValue().toByteArray)
    // Row returns mutable.ArraySeq / collection.Map — match the BASE trait,
    // not the 2.13 immutable default alias, or arrays silently fall through
    case (x: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val es = elementSchema(nonNull(schema).getElementType)
      x.map(toAvroValue(_, elem, es)).toList.asJava
    case (x: scala.collection.Map[_, _], MapType(_, vt, _)) =>
      val vs = elementSchema(nonNull(schema).getValueType)
      x.map { case (k, value) => k.toString -> toAvroValue(value, vt, vs) }.toMap.asJava
    case (x: Row, st: StructType) => rowToRecord(x, st, nonNull(schema))
    case (x, _) => x // primitives pass through (Int/Long/Float/Double/Boolean/String)
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def elementSchema(s: Schema): Schema = s

  private def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      rec.put(f.name,
        toAvroValue(row.get(i), f.dataType, schema.getField(f.name).schema()))
      i += 1
    }
    rec
  }

  /** `fieldSchema` is the (possibly union-wrapped) Avro schema of THIS
    * value, from the file header — logical-type details the Catalyst type
    * alone can't carry (timestamp-millis vs -micros, decimal scale) decode
    * from it, so externally-written files read back exactly.
    */
  private def fromAvroValue(v: Any, dt: DataType, fieldSchema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (x: org.apache.avro.util.Utf8, StringType) => x.toString
    case (x: CharSequence, StringType) => x.toString
    case (x: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => x.toString
    case (x: java.lang.Long, TimestampType) =>
      val lt = Option(nonNull(fieldSchema).getLogicalType).map(_.getName)
      val micros = if (lt.contains("timestamp-millis")) x * 1000L else x.longValue()
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(micros)
    case (x: java.lang.Integer, DateType) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(x)
    case (x: java.nio.ByteBuffer, d: DecimalType) =>
      val b = new Array[Byte](x.remaining()); x.duplicate().get(b)
      decimalFrom(b, d, fieldSchema)
    case (x: org.apache.avro.generic.GenericFixed, d: DecimalType) =>
      decimalFrom(x.bytes(), d, fieldSchema)
    case (x: java.nio.ByteBuffer, BinaryType) =>
      val b = new Array[Byte](x.remaining()); x.duplicate().get(b); b
    case (x: org.apache.avro.generic.GenericFixed, BinaryType) => x.bytes().clone()
    case (x: java.util.List[_], ArrayType(elem, _)) =>
      val es = nonNull(fieldSchema).getElementType
      x.asScala.map(fromAvroValue(_, elem, es)).toSeq
    case (x: java.util.Map[_, _], MapType(_, vt, _)) =>
      val vs = nonNull(fieldSchema).getValueType
      x.asScala.map { case (k, value) => k.toString -> fromAvroValue(value, vt, vs) }.toMap
    case (x: GenericRecord, st: StructType) => recordToRow(x, st)
    case (x, _) => x
  }

  /** Unscaled two's-complement bytes → BigDecimal at the FILE's scale (the
    * writer's logical type is the truth), rescaled to the requested
    * Catalyst scale only when an explicit read schema asks for a different
    * one (exact rescale — refuse on precision loss via ArithmeticException).
    */
  private def decimalFrom(unscaled: Array[Byte], d: DecimalType, fieldSchema: Schema): java.math.BigDecimal = {
    val fileScale = nonNull(fieldSchema).getLogicalType match {
      case dec: LogicalTypes.Decimal => dec.getScale
      case _ => d.scale
    }
    val bd = new java.math.BigDecimal(new java.math.BigInteger(unscaled), fileScale)
    if (fileScale == d.scale) bd else bd.setScale(d.scale)
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map { f =>
      // field may be absent when reading with a file's own schema subset
      val af = rec.getSchema.getField(f.name)
      if (af == null) null else fromAvroValue(rec.get(f.name), f.dataType, af.schema())
    })

  // ---- read / write -------------------------------------------------------

  /** Write `df` as snappy Avro container files, one per partition, plus the
    * standard Hadoop `_SUCCESS` marker.
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st).toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroJson))
    // avro.output.codec is only consulted when Hadoop output compression is
    // ON (AvroOutputFormatBase.getCompressionCodec checks
    // FileOutputFormat.getCompressOutput first) — enable it, or the codec
    // setting is silently ignored and files come out uncompressed
    org.apache.hadoop.mapreduce.lib.output.FileOutputFormat.setCompressOutput(job, true)
    job.getConfiguration.set("avro.output.codec", "snappy")
    df.rdd.mapPartitions { rows =>
      // Schema is not serializable: parse once per task from the JSON
      val schema = new Schema.Parser().parse(avroJson)
      rows.map(r => (new AvroKey[GenericRecord](rowToRecord(r, st, schema)),
        NullWritable.get()))
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read a directory of Avro container files (schema from the first
    * file's header, or an explicit expected Catalyst schema). Splits ride
    * the container sync markers — block-level parallel like parquet.
    */
  def readAvro(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val files = fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/part-*"))
    require(files != null && files.nonEmpty, s"no Avro part files under $path")
    val headerSchema = {
      val in = new FsInput(files.head.getPath, conf)
      val r = new org.apache.avro.file.DataFileReader(
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try r.getSchema finally { r.close() }
    }
    val st = schema.getOrElse(toCatalystType(headerSchema))
    val job = Job.getInstance(conf)
    AvroJob.setInputKeySchema(job, headerSchema)
    val rowRdd = spark.sparkContext.newAPIHadoopFile(
      s"$path/part-*",
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
      // convert INSIDE the scan task, before the Hadoop reader can reuse
      // the record object and before anything would have to serialize a
      // GenericRecord
      .map { case (k, _) => recordToRow(k.datum(), st) }
    spark.createDataFrame(rowRdd, st)
  }
}
