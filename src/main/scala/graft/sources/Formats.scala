package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format surface: parquet (the native lakehouse format),
  * CSV and JSON lines (interchange), each with explicit-schema reads.
  *
  * Scale notes (100 TB): parquet is the only format the engine treats
  * as a system of record — columnar pruning, predicate pushdown, and
  * splittable compression all depend on it. CSV/JSON are ingest/egress
  * edges: reads always pass an explicit schema so Spark never runs the
  * full-scan inference pass (at 100 TB, inference is a second read of
  * the corpus), and writes go through the same partitioned layout as
  * parquet so a converted dataset keeps its pruning keys.
  */
object Formats {

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Explicit schema: no inference scan, no stringly-typed columns. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC: the other columnar system-of-record format — same pruning /
    * pushdown / splittability contract as parquet, for estates that
    * standardized on it.
    */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
