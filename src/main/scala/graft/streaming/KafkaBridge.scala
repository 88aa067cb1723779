package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter between graft's [[EventLog]] envelope and the Apache Kafka
  * connector's wire schema, so the same pipeline code runs against
  * either transport (BASELINE's stated approach is "Structured
  * Streaming with Kafka source/sink"; the sandbox has no broker, so
  * the mapping is exercised frame-to-frame and the broker-side
  * builders are thin `format("kafka")` configuration).
  *
  * Reference surface being bridged: the producer/consumer pair in
  * joshlong-attic/spring-and-kafka `jc/DemoApplication.java:104-160`
  * (keyed string messages, consumer group, replay-from-smallest).
  *
  * Envelope (what [[EventLog]] reads/writes):
  *   topic string, partition int, offset long, key string,
  *   payload string, produced_at timestamp
  * Kafka wire (what `format("kafka")` reads/writes, per the Spark
  * Kafka integration docs):
  *   key binary, value binary, topic string, partition int,
  *   offset long, timestamp timestamp, timestampType int
  */
object KafkaBridge {

  /** The Kafka source's fixed output schema. */
  val WireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Envelope → wire: what a `format("kafka")` SINK accepts (topic /
    * key / value / partition; offset and timestamp are broker-assigned
    * on write, so they are not part of the sink projection).
    */
  def toWire(envelope: DataFrame, topic: String): DataFrame =
    envelope.select(
      encode(col("key"), "UTF-8").as("key"),
      encode(col("payload"), "UTF-8").as("value"),
      lit(topic).as("topic"),
      col("partition").cast(IntegerType).as("partition"))

  /** Wire → envelope: decode a Kafka source frame (batch or
    * streaming) into the [[EventLog]] envelope, `topic` preserved so
    * multi-topic subscriptions stay distinguishable (the reference
    * handler receives `Map<topic, List<payload>>`).
    */
  def fromWire(wire: DataFrame): DataFrame =
    wire.select(
      col("topic"),
      col("partition"),
      col("offset"),
      decode(col("key"), "UTF-8").as("key"),
      decode(col("value"), "UTF-8").as("payload"),
      col("timestamp").as("produced_at"))

  /** Source options for `spark.readStream.format("kafka")` — replay
    * from earliest by default (`auto.offset.reset=smallest` in the
    * reference consumer).
    */
  def sourceOptions(brokers: String, topics: Seq[String],
                    startingOffsets: String = "earliest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets)

  /** Sink options for `df.writeStream.format("kafka")`. */
  def sinkOptions(brokers: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "topic" -> topic)

  /** Streaming read through the configured transport. With
    * `spark.graft.transport=kafka` (+ `spark.graft.brokers`) this is
    * the Kafka source; otherwise it is the parquet-backed [[EventLog]]
    * — both yield the same envelope schema, so downstream transforms
    * are transport-agnostic.
    */
  def readStream(spark: SparkSession, topic: String, log: => EventLog): DataFrame =
    if (transport(spark) == "kafka")
      fromWire(spark.readStream.format("kafka")
        .options(sourceOptions(brokers(spark), Seq(topic))).load())
    else
      log.readStream(spark).withColumn("topic", lit(topic))
        .select("topic", "partition", "offset", "key", "payload", "produced_at")

  /** Streaming write through the configured transport: Kafka sink or
    * [[EventLog]] foreachBatch append.
    */
  def writeStream(stream: DataFrame, topic: String, checkpointDir: String,
                  log: => EventLog):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = stream.sparkSession
    if (transport(spark) == "kafka")
      toWire(stream, topic).writeStream.format("kafka")
        .options(sinkOptions(brokers(spark), topic))
        .option("checkpointLocation", checkpointDir)
    else
      log.writeStream(stream, checkpointDir)
  }

  private def transport(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.transport").getOrElse("log")

  private def brokers(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.brokers").getOrElse(
      throw new IllegalArgumentException(
        "spark.graft.brokers must be set when spark.graft.transport=kafka"))
}
