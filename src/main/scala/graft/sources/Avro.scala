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
  * Scope: record schemas over Spark's scalar types (string,
  * int/long, float/double, boolean, binary, timestamp as the
  * `timestamp-micros` logical type), nullable fields as
  * `union(null, T)`, and arbitrarily nested containers — arrays,
  * `map<string, T>`, and structs compose to any depth (the
  * `props`-envelope, array-of-record event-batch, and
  * struct-in-struct metadata shapes Kafka messages actually carry).
  * Nested record names stay unique by carrying the field path.
  * Unions beyond `union(null, T)`, non-string map keys, and Avro
  * fixed/enum stay out of scope — parquet/ORC remain the
  * system-of-record formats.
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
    def nullable(s: Schema, isNullable: Boolean): Schema =
      if (isNullable)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), s).asJava)
      else s
    // containers recurse to any depth (array-of-record envelopes,
    // map-of-struct props, …); record names stay unique because the
    // field PATH is threaded through `name`
    def base(dt: DataType, depth: Int, name: String): Schema = dt match {
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
      case ArrayType(et, containsNull) =>
        Schema.createArray(nullable(base(et, depth + 1, name), containsNull))
      case MapType(StringType, vt, hasNullValues) =>
        Schema.createMap(nullable(base(vt, depth + 1, name), hasNullValues))
      case st: StructType =>
        Schema.createRecord(s"${recordName}_$name", null, "graft", false,
          st.fields.map { f =>
            val t = nullable(base(f.dataType, depth + 1, s"${name}_${f.name}"), f.nullable)
            new Schema.Field(f.name, t, null,
              if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
          }.toList.asJava)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported type for Avro interchange at depth $depth: $other (use parquet/ORC)")
    }
    val fields = schema.fields.map { f =>
      val t = nullable(base(f.dataType, 0, f.name), f.nullable)
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
    def dt(s: Schema, depth: Int): DataType = s.getType match {
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
      case Schema.Type.ARRAY =>
        val (inner, n) = unpack(s.getElementType)
        ArrayType(dt(inner, depth + 1), n)
      case Schema.Type.MAP =>
        val (inner, n) = unpack(s.getValueType)
        MapType(StringType, dt(inner, depth + 1), n)
      case Schema.Type.RECORD =>
        StructType(s.getFields.asScala.map { f =>
          val (inner, n) = unpack(f.schema())
          StructField(f.name(), dt(inner, depth + 1), n)
        }.toSeq)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Avro type at depth $depth: $other")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (inner, nullable) = unpack(f.schema())
      StructField(f.name(), dt(inner, 0), nullable)
    }.toSeq)
  }

  /** Resolve `union(null, T)` to its `T` branch (identity for
    * non-union schemas) — the writers need the concrete container
    * schema to build nested array/map/record values.
    */
  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def toAvroValue(v: Any, dt: DataType, schema0: Schema): Any = {
    val schema = nonNullBranch(schema0)
    (v, dt) match {
      case (null, _) => null
      case (t: java.sql.Timestamp, _) =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case (i: java.time.Instant, _) =>
        i.getEpochSecond * 1000000L + i.getNano / 1000
      case (b: Array[Byte], _) => java.nio.ByteBuffer.wrap(b)
      case (s: Short, _) => s.toInt
      case (b: Byte, _) => b.toInt
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        seq.map(x => toAvroValue(x, et, schema.getElementType)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        val out = new java.util.HashMap[String, Any](m.size)
        m.foreach { case (k, x) =>
          out.put(k.toString, toAvroValue(x, vt, schema.getValueType)) }
        out
      case (r: Row, st: StructType) =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < st.length) {
          rec.put(i, toAvroValue(r.get(i), st(i).dataType,
            schema.getFields.get(i).schema()))
          i += 1
        }
        rec
      case (other, _) => other
    }
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
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.map(fromAvroValue(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, x) =>
        k.toString -> fromAvroValue(x, vt) }.toMap
    case (rec: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
        fromAvroValue(rec.get(i), f.dataType)
      }.toSeq)
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
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val schema = new Schema.Parser().parse(schemaJson)
      // task-commit protocol: write to an attempt-unique temp name,
      // rename into place on success. Two attempts of the same task
      // (retry, speculation) can run concurrently — writing the final
      // name directly would interleave their bytes into one corrupt
      // container that only fails at decode time. With the temp name
      // each attempt owns its bytes; the rename is the commit, and a
      // lost rename race means a twin already committed this
      // partition's identical output.
      val fin = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
      val tmp = new org.apache.hadoop.fs.Path(
        path, f"part-$pid%05d.avro.${tc.taskAttemptId()}.tmp")
      val tfs = tmp.getFileSystem(hconf)
      val os = tfs.create(tmp, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      writer.create(schema, os)
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, toAvroValue(row.get(i), sparkSchema(i).dataType,
            schema.getFields.get(i).schema()))
          i += 1
        }
        writer.append(rec)
      } finally writer.close()
      if (!tfs.rename(tmp, fin)) {
        tfs.delete(tmp, false)
        if (!tfs.exists(fin))
          throw new java.io.IOException(s"commit failed for $fin")
      }
    }
  }

  /** Read a [[writeAvro]] directory (or any directory of Avro
    * container files sharing one schema). One file = one task:
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
          rec.put(dst, toAvroValue(row.get(src), payload(dst).dataType,
            schema.getFields.get(dst).schema()))
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
