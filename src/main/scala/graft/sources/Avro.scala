package graft.sources

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro support built directly on avro-core (the `spark-avro`
  * connector module is not on this classpath; the `org.apache.avro`
  * runtime is, since Spark itself ships it): Avro Object Container
  * Files as a [[Formats]]-style source/sink, and a single-record
  * binary codec for Kafka-style message values — the most common
  * Kafka wire format, closing the bridge gap next to
  * [[graft.streaming.KafkaBridge]]'s UTF-8 path.
  *
  * Scope: flat record schemas over Spark's scalar types (string,
  * int/long, float/double, boolean, binary, timestamp as the
  * `timestamp-micros` logical type), nullable fields as
  * `union(null, T)` — the shape message envelopes and interchange
  * tables actually have. Nested/array schemas stay on parquet/ORC,
  * the system-of-record formats.
  *
  * Scale notes (100 TB): both directions are embarrassingly
  * parallel — the writer emits one container file per partition
  * through the Hadoop filesystem API (works on any cluster store,
  * not just local disk), the reader decodes whole files per task via
  * the `binaryFile` source (container files are NOT splittable here:
  * one file = one task, so write-side partitioning sets read
  * parallelism — same contract as gzip'd JSON). The per-record codec
  * is a narrow `mapPartitions` with one reused encoder per
  * partition, no driver involvement. Schemas travel to executors as
  * JSON strings (`Schema` itself is not serializable-stable) and are
  * parsed once per partition.
  */
object Avro {

  /** Spark schema → Avro record schema (fields in Spark order,
    * nullables as `union(null, T)`).
    */
  def avroSchemaFor(schema: StructType, recordName: String = "row"): Schema = {
    def base(dt: DataType): Schema = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported type for Avro interchange: $other (use parquet/ORC)")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), base(f.dataType)).asJava)
      else base(f.dataType)
      new Schema.Field(f.name, t, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  /** Avro record schema → Spark schema (the read-side inverse). */
  def sparkSchemaFor(schema: Schema): StructType = {
    def unpack(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"only union(null, T) supported: $s")
        (nonNull.head, true)
      } else (s, false)
    def dt(s: Schema): DataType = s.getType match {
      case Schema.Type.STRING => StringType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG =>
        if (s.getLogicalType != null &&
            s.getLogicalType.getName == "timestamp-micros") TimestampType
        else LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (inner, nullable) = unpack(f.schema())
      StructField(f.name(), dt(inner), nullable)
    }.toSeq)
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => other
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(l, 1000000L) * 1000).toInt)
      ts
    case (u: org.apache.avro.util.Utf8, _) => u.toString
    case (s: CharSequence, _) => s.toString
    case (b: java.nio.ByteBuffer, _) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (other, _) => other
  }

  /** Write one Avro Object Container File per partition through the
    * Hadoop filesystem API. Snappy-coded blocks (the splittable-ish
    * default the ecosystem expects inside container files).
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchemaFor(df.schema).toString
    val sparkSchema = df.schema
    // Hadoop Configuration is not serializable; ship the entries the
    // filesystem resolution needs instead (defaultFS covers cluster
    // stores; everything else rides on the path's own scheme)
    val defaultFs = df.sparkSession.sparkContext.hadoopConfiguration
      .get("fs.defaultFS", "file:///")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    df.rdd.foreachPartition { rows =>
      val hconf = new org.apache.hadoop.conf.Configuration()
      hconf.set("fs.defaultFS", defaultFs)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val schema = new Schema.Parser().parse(schemaJson)
      val out = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
      val os = out.getFileSystem(hconf).create(out, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      writer.create(schema, os)
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, toAvroValue(row.get(i))); i += 1
        }
        writer.append(rec)
      } finally writer.close()
    }
  }

  /** Read a [[writeAvro]] directory (or any directory of Avro
    * container files sharing one flat schema). One file = one task:
    * the `binaryFile` source hands each container to its decoder
    * whole, schema taken from the first file's header.
    */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select("content")
    val headBytes = files.limit(1).collect() match {
      case Array(r) => r.getAs[Array[Byte]](0)
      case _ => throw new IllegalArgumentException(s"no .avro files under $path")
    }
    val headReader = new DataFileReader(
      new SeekableByteArrayInput(headBytes),
      new GenericDatumReader[GenericRecord]())
    val schemaJson = try headReader.getSchema.toString finally headReader.close()
    val sparkSchema = sparkSchemaFor(new Schema.Parser().parse(schemaJson))
    val rows = files.rdd.flatMap { fileRow =>
      val reader = new DataFileReader(
        new SeekableByteArrayInput(fileRow.getAs[Array[Byte]](0)),
        new GenericDatumReader[GenericRecord](
          new Schema.Parser().parse(schemaJson)))
      new Iterator[Row] {
        def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
        def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(sparkSchema.fields.zipWithIndex.map { case (f, i) =>
            fromAvroValue(rec.get(i), f.dataType)
          }.toSeq)
        }
      }
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Encode the named columns of each row into one standalone
    * Avro-binary value per record (Kafka-style message value: raw
    * datum bytes, schema carried out-of-band as in a schema
    * registry). Output keeps every OTHER column and appends
    * `avro_value: binary` — the projection a `format("kafka")` sink
    * takes as `value`.
    */
  def encodeRecords(df: DataFrame, fields: Seq[String],
                    valueCol: String = "avro_value"): DataFrame = {
    val spark = df.sparkSession
    val payload = StructType(fields.map(f => df.schema(f)))
    val schemaJson = avroSchemaFor(payload, "message").toString
    val keep = df.schema.fields.map(_.name).filterNot(fields.contains)
    val outSchema = StructType(
      keep.map(df.schema(_)) :+ StructField(valueCol, BinaryType))
    val keepIdx = keep.map(df.schema.fieldIndex)
    val fieldIdx = fields.map(df.schema.fieldIndex)
    val rows = df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val buf = new ByteArrayOutputStream()
      it.map { row =>
        buf.reset()
        val enc = EncoderFactory.get().binaryEncoder(buf, null)
        val rec = new GenericData.Record(schema)
        fieldIdx.zipWithIndex.foreach { case (src, dst) =>
          rec.put(dst, toAvroValue(row.get(src)))
        }
        writer.write(rec, enc); enc.flush()
        Row.fromSeq(keepIdx.map(row.get).toSeq :+ buf.toByteArray)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Decode a standalone Avro-binary column back into its record
    * fields (the consumer half of [[encodeRecords]]); the writer's
    * payload schema is the decode contract, passed as the Spark
    * schema of the encoded fields.
    */
  def decodeRecords(df: DataFrame, payload: StructType,
                    valueCol: String = "avro_value"): DataFrame = {
    val spark = df.sparkSession
    val schemaJson = avroSchemaFor(payload, "message").toString
    val keep = df.schema.fields.map(_.name).filterNot(_ == valueCol)
    val outSchema = StructType(keep.map(df.schema(_)) ++ payload.fields)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    val rows = df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      it.map { row =>
        val dec = DecoderFactory.get()
          .binaryDecoder(row.getAs[Array[Byte]](valIdx), null)
        val rec = reader.read(null, dec)
        Row.fromSeq(keepIdx.map(row.get).toSeq ++
          payload.fields.zipWithIndex.map { case (f, i) =>
            fromAvroValue(rec.get(i), f.dataType)
          })
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
