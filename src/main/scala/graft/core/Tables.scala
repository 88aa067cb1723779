package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All operators read through here so that a future move from local
  * parquet to a real lakehouse layout (partitioned / bucketed tables)
  * is a one-file change.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped under several parquet encodings: plain
    * TIMESTAMP(µs) (with or without UTC adjustment — the normal event-log
    * layout), and historically TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects unless read back as raw nanos. Adapt to whatever the
    * file actually contains instead of assuming one encoding:
    *   - LongType (nanosAsLong fallback): integer-divide to µs
    *     (epoch nanos exceed 2^53, so float division would lose precision);
    *   - TIMESTAMP_NTZ: reinterpret in the session zone (UTC) as the
    *     session TimestampType, value-preserving;
    *   - TimestampType: use directly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTs(load(s, d, "events"))
  }

  /** Normalize an events relation's `ts` to the session TimestampType,
    * whatever physical type it loaded as. Works on batch AND streaming
    * DataFrames (schema is static either way) — the streaming specs
    * route their file-source reads through here too.
    */
  def withEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** The engine's ONE doc_id → basis-point hash (md5 lower-63-bit mod
    * 10⁴) behind every sampling/split/curation decision
    * ([[graft.operators.Analytics.pipelineSplit]]/`pipelineSample`/
    * `pipelineCurate`, [[graft.dedup.Dedup.pipelineDecontam]]).
    * Single definition so the decontamination audit can never
    * silently diverge from the split it audits; hash-based (not RNG)
    * so membership is reproducible across runs, engines, and
    * partitionings.
    */
  def docBasisPoints: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      "(graft_md5lower64(cast(doc_id as string)) & 9223372036854775807) % 10000")

  /** The canonical 90/5/5 train/val/test assignment over
    * [[docBasisPoints]] — shared by `pipelineSplit` and
    * `pipelineDecontam` (same single-definition rationale).
    */
  def splitOf(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, when}
    when(h < 9000, lit("train")).when(h < 9500, lit("val")).otherwise(lit("test"))
  }

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the whole surface is
    * reachable from `spark.sql(...)` (plus the graft_* functions the
    * extensions install) — the SQL-first entry point.
    */
  def registerViews(s: SparkSession, d: String): Unit =
    All.foreach { name =>
      val df = if (name == "events") events(s, d) else load(s, d, name)
      df.createOrReplaceTempView(name)
    }
}
