package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{EventLog, KafkaBridge}

/** The Kafka connector adapter, exercised without a broker: the wire
  * schema is fixed by the Spark Kafka integration contract, so the
  * envelope⇄wire mapping and the option builders can be verified
  * frame-to-frame (the broker-side `format("kafka")` call is thin
  * configuration around them).
  */
class KafkaBridgeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def wireFrame() = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until 50).map { i =>
      Row(s"$i".getBytes("UTF-8"), s"#$i".getBytes("UTF-8"),
          if (i % 2 == 0) "evens" else "odds",
          i % 4, i.toLong / 4,
          java.sql.Timestamp.valueOf("2015-06-01 12:00:00"), 0)
    }
    spark.createDataFrame(rows.asJava, KafkaBridge.WireSchema)
  }

  test("fromWire decodes the Kafka source schema into the EventLog envelope") {
    import spark.implicits._
    val env = KafkaBridge.fromWire(wireFrame())
    assert(env.columns.toSeq ==
      Seq("topic", "partition", "offset", "key", "payload", "produced_at"))
    // payload/key decode back to the produced strings; topic preserved
    val bad = env.filter($"payload" =!= concat(lit("#"), $"key")).count()
    assert(bad == 0)
    assert(env.filter($"topic" === "evens").count() == 25)
    assert(env.schema("produced_at").dataType == TimestampType)
  }

  test("toWire round-trips the envelope back to sink columns") {
    import spark.implicits._
    val env = KafkaBridge.fromWire(wireFrame())
    val sunk = KafkaBridge.toWire(env, "out-topic")
    // sink projection: key/value binary + topic + partition (offset and
    // timestamp are broker-assigned, so they must NOT be in the frame)
    assert(sunk.columns.toSeq == Seq("key", "value", "topic", "partition"))
    assert(sunk.schema("key").dataType == BinaryType)
    assert(sunk.schema("value").dataType == BinaryType)
    val back = sunk.select(
      decode($"key", "UTF-8").as("key"),
      decode($"value", "UTF-8").as("payload"))
    assert(back.filter($"payload" =!= concat(lit("#"), $"key")).count() == 0)
    assert(sunk.select("topic").distinct().collect().map(_.getString(0)).toSeq
      == Seq("out-topic"))
  }

  test("source/sink options carry brokers, subscription, and replay-from-earliest") {
    val src = KafkaBridge.sourceOptions("b1:9092,b2:9092", Seq("evens", "odds"))
    assert(src("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(src("subscribe") == "evens,odds")
    assert(src("startingOffsets") == "earliest") // auto.offset.reset=smallest
    val snk = KafkaBridge.sinkOptions("b1:9092", "out")
    assert(snk("kafka.bootstrap.servers") == "b1:9092")
    assert(snk("topic") == "out")
  }

  test("option maps pin the connector's literal option keys, nothing else") {
    // the Spark Kafka integration contract: these exact strings are
    // what format("kafka") looks up — a typo'd or renamed key fails
    // only at the broker, so the key SET is pinned here
    assert(KafkaBridge.sourceOptions("b:9092", Seq("t")).keySet ==
      Set("kafka.bootstrap.servers", "subscribe", "startingOffsets"))
    assert(KafkaBridge.sinkOptions("b:9092", "t").keySet ==
      Set("kafka.bootstrap.servers", "topic"))
  }

  test("e2e produce -> consume against a real broker (gated on SPARK_GRAFT_KAFKA_BOOTSTRAP)") {
    import spark.implicits._
    // runs iff a broker is reachable (and the spark-sql-kafka connector
    // is on the classpath, which any broker-equipped deployment has);
    // cancels cleanly in the sandbox — the day a broker exists, this
    // proves the bridge end-to-end, matching the reference's actual
    // producer/consumer path (jc/DemoApplication.java:100-160)
    val bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "SPARK_GRAFT_KAFKA_BOOTSTRAP not set — no broker in this environment")
    val topic = s"graft-e2e-${java.util.UUID.randomUUID().toString.take(8)}"
    // partition 0 everywhere: the topic is broker-auto-created and a
    // stock broker defaults to num.partitions=1 — explicit partitions
    // 1..3 would fail for an environment reason, not a bridge bug
    val envelope = spark.range(0, 100)
      .select($"id".cast("string").as("key"),
              concat(lit("#"), $"id").as("payload"),
              lit(0).as("partition"))
    KafkaBridge.toWire(envelope, topic)
      .write.format("kafka")
      .options(KafkaBridge.sinkOptions(bootstrap.get, topic))
      .save()
    val back = KafkaBridge.fromWire(
      spark.read.format("kafka")
        .options(KafkaBridge.sourceOptions(bootstrap.get, Seq(topic)))
        .option("endingOffsets", "latest").load())
    assert(back.count() == 100)
    assert(back.filter($"payload" =!= concat(lit("#"), $"key")).count() == 0)
    assert(back.select("topic").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(topic))
  }

  test("transport=kafka without brokers fails fast, before any source is built") {
    val base = java.nio.file.Files.createTempDirectory("graft-nobroker").toString
    val log = new EventLog(base + "/t", numPartitions = 2)
    spark.conf.set("spark.graft.transport", "kafka")
    try {
      val err = intercept[IllegalArgumentException] {
        KafkaBridge.readStream(spark, "t", log)
      }
      assert(err.getMessage.contains("spark.graft.brokers"))
    } finally spark.conf.unset("spark.graft.transport")
  }

  test("transport=log streams through EventLog with the same envelope schema") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bridge").toString
    val log = new EventLog(base + "/t", numPartitions = 4)
    log.produce(spark.range(0, 80)
      .select($"id".cast("string").as("key"), concat(lit("#"), $"id").as("payload")))
    val stream = KafkaBridge.readStream(spark, "t", log)
    assert(stream.isStreaming)
    assert(stream.columns.toSeq ==
      Seq("topic", "partition", "offset", "key", "payload", "produced_at"))
    val q = stream.writeStream.format("memory").queryName("bridge_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("bridge_sink")
    assert(got.count() == 80)
    assert(got.select("topic").distinct().collect().map(_.getString(0)).toSeq
      == Seq("t"))
  }
}
