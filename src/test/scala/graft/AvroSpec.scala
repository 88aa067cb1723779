package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Avro
import graft.streaming.EventLog

/** Avro interchange built on avro-core: container-file round trips
  * (typed, nullable, timestamped), Kafka-style single-record value
  * encode/decode, and the envelope⇄Avro-wire path next to
  * KafkaBridge's UTF-8 one.
  */
class AvroSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("container files round-trip the documents table exactly") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("graft-avro").toString + "/docs"
    Avro.writeAvro(docs, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema == docs.schema,
      s"schema drifted: ${back.schema} vs ${docs.schema}")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 &&
           docs.exceptAll(back).count() == 0, "rows drifted through Avro")
    // one container file per input partition — write-side parallelism
    // is the read-side task count
    val nFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro"))
    assert(nFiles == docs.rdd.getNumPartitions)
  }

  test("nullable, binary, and timestamp fields survive the container round trip") {
    import spark.implicits._
    val df = spark.range(0, 100)
      .select(
        $"id",
        when($"id" % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), $"id")).as("s"),
        when($"id" % 4 === 0, lit(null).cast("double"))
          .otherwise($"id" * 1.5).as("d"),
        ($"id" % 2 === 0).as("b"),
        unhex(lpad(hex($"id"), 6, "0")).as("bin"),
        timestamp_micros($"id" * 1000000L + $"id").as("ts"))
    val dir = Files.createTempDirectory("graft-avro-typed").toString + "/t"
    Avro.writeAvro(df, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // micros precision exact (the logical type is timestamp-micros)
    assert(back.filter($"ts" === timestamp_micros($"id" * 1000000L + $"id"))
      .count() == 100)
  }

  test("single-record codec: encode to avro_value bytes, decode restores fields") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro-wire").toString + "/topic"
    val log = new EventLog(dir, numPartitions = 4)
    log.produce(spark.range(0, 200)
      .select($"id".cast("string").as("key"),
        when($"id" % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("#"), $"id")).as("payload")))
    val envelope = log.consume(spark)
    // producer side: the message value is the Avro-encoded
    // (key, payload, produced_at) record; partition/offset stay as
    // routing columns exactly as a format("kafka") sink wants them
    val payloadSchema = StructType(Seq(
      StructField("key", StringType),
      StructField("payload", StringType),
      StructField("produced_at", TimestampType)))
    val wire = Avro.encodeRecords(envelope,
      Seq("key", "payload", "produced_at"))
    assert(wire.schema.fieldNames.toSet ==
      Set("partition", "offset", "avro_value"))
    assert(wire.filter(length($"avro_value") <= 0).count() == 0)
    // consumer side: decode restores the exact envelope
    val decoded = Avro.decodeRecords(wire, payloadSchema)
      .select("partition", "offset", "key", "payload", "produced_at")
    val original = envelope
      .select("partition", "offset", "key", "payload", "produced_at")
    assert(decoded.exceptAll(original).count() == 0 &&
           original.exceptAll(decoded).count() == 0,
      "envelope drifted through the Avro wire codec")
  }

  test("props-style envelope round-trips: array, map, and struct fields") {
    import spark.implicits._
    // the Kafka message shapes one nesting level buys: a headers map,
    // a tags array, and a small metadata struct — alongside scalars
    val df = spark.range(0, 120)
      .select(
        $"id",
        concat(lit("#"), $"id").as("payload"),
        array(concat(lit("t"), $"id" % 3), lit("all")).as("tags"),
        map(lit("source"), concat(lit("s"), $"id" % 5),
            lit("trace"), when($"id" % 4 === 0, lit(null).cast("string"))
              .otherwise(concat(lit("tr-"), $"id"))).as("props"),
        struct($"id".as("seq"),
               ($"id" % 2 === 0).as("retained"),
               concat(lit("v"), $"id" % 7).as("version")).as("meta"))
    val dir = Files.createTempDirectory("graft-avro-nested").toString + "/n"
    Avro.writeAvro(df, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema == df.schema,
      s"nested schema drifted: ${back.schema} vs ${df.schema}")
    // set-ops reject MAP columns — compare on sorted entry arrays
    // (order-insensitive, exactly the map's semantics)
    def cmp(d: org.apache.spark.sql.DataFrame) = d.select(
      $"id", $"payload", $"tags",
      array_sort(map_entries($"props")).as("props_e"), $"meta")
    assert(cmp(back).exceptAll(cmp(df)).count() == 0 &&
           cmp(df).exceptAll(cmp(back)).count() == 0,
      "nested rows drifted through the container round trip")
    // and through the single-record wire codec too
    val wire = Avro.encodeRecords(df, Seq("payload", "tags", "props", "meta"))
    val payloadSchema = StructType(Seq(
      df.schema("payload"), df.schema("tags"),
      df.schema("props"), df.schema("meta")))
    val decoded = Avro.decodeRecords(wire, payloadSchema)
      .select(df.columns.map(col).toSeq: _*)
    assert(cmp(decoded).exceptAll(cmp(df)).count() == 0 &&
           cmp(df).exceptAll(cmp(decoded)).count() == 0,
      "nested envelope drifted through the Avro wire codec")
  }

  test("deep nesting round-trips: record batches, map-of-struct, array-of-array") {
    import spark.implicits._
    // the shapes arbitrary-depth nesting buys: an array-of-record
    // event batch (the Kafka batch-envelope value), map<string,
    // struct> context, array-of-array, and a struct whose field is
    // itself an array of records (depth 3)
    val df = spark.range(0, 90)
      .select(
        $"id",
        array(
          struct($"id".as("seq"), lit("open").as("kind"),
                 when($"id" % 3 === 0, lit(null).cast("string"))
                   .otherwise(concat(lit("d"), $"id")).as("detail")),
          struct(($"id" + 1).as("seq"), lit("close").as("kind"),
                 lit(null).cast("string").as("detail"))).as("events"),
        map(lit("ctx"),
            struct(concat(lit("h"), $"id" % 4).as("host"),
                   array($"id" % 2, $"id" % 5).as("codes"))).as("ctx_by_name"),
        array(array($"id", $"id" + 1), array($"id" * 2)).as("pairs"),
        struct(concat(lit("b"), $"id" % 6).as("batch"),
               array(struct(lit("x").as("k"), ($"id" % 7).as("v"))).as("kvs"))
          .as("meta"))
    val dir = Files.createTempDirectory("graft-avro-deep").toString + "/d"
    Avro.writeAvro(df, dir)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema == df.schema,
      s"deep schema drifted: ${back.schema} vs ${df.schema}")
    // set-ops reject MAP columns — compare maps as sorted entry arrays
    def cmp(d: org.apache.spark.sql.DataFrame) = d.select(
      $"id", $"events", array_sort(map_entries($"ctx_by_name")).as("ctx_e"),
      $"pairs", $"meta")
    assert(cmp(back).exceptAll(cmp(df)).count() == 0 &&
           cmp(df).exceptAll(cmp(back)).count() == 0,
      "deep rows drifted through the container round trip")
    // and through the single-record wire codec
    val wire = Avro.encodeRecords(df,
      Seq("events", "ctx_by_name", "pairs", "meta"))
    val payloadSchema = StructType(Seq(
      df.schema("events"), df.schema("ctx_by_name"),
      df.schema("pairs"), df.schema("meta")))
    val decoded = Avro.decodeRecords(wire, payloadSchema)
      .select(df.columns.map(col).toSeq: _*)
    assert(cmp(decoded).exceptAll(cmp(df)).count() == 0 &&
           cmp(df).exceptAll(cmp(decoded)).count() == 0,
      "deep envelope drifted through the Avro wire codec")
  }

  test("genuinely unsupported shapes are rejected loudly, not mis-encoded") {
    import spark.implicits._
    // non-string map keys have no Avro representation
    val badKeys = spark.range(0, 3)
      .select(map($"id", concat(lit("v"), $"id")).as("m"))
    val e = intercept[IllegalArgumentException] {
      Avro.avroSchemaFor(badKeys.schema)
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
