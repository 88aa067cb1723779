package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Formats
import java.nio.file.Files

/** Source/sink round-trips: every interchange format reads back the
  * exact rows and (explicit) schema it wrote.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def customers() = graft.core.Tables.customer(spark, sf)

  test("parquet round-trip with partition keys preserved") {
    val base = Files.createTempDirectory("graft-fmt").toString
    val df = customers()
    Formats.writeParquet(df, s"$base/c", partitionBy = Seq("c_mktsegment"))
    val back = Formats.readParquet(spark, s"$base/c")
    assert(back.count() == df.count())
    assert(back.columns.toSet == df.columns.toSet)
    // partitionBy moves the key column last; compare in sorted order
    val cols = df.columns.sorted.toSeq.map(org.apache.spark.sql.functions.col)
    assert(back.select(cols: _*).exceptAll(df.select(cols: _*)).count() == 0)
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-dpo").toString
    val df = customers().select($"c_custkey", $"c_mktsegment")
    Formats.writeParquet(df, s"$base/c", partitionBy = Seq("c_mktsegment"))
    val before = spark.read.parquet(s"$base/c")
    val otherSegments = before.filter($"c_mktsegment" =!= "BUILDING").count()
    // rewrite ONE partition with a single marker row; static overwrite
    // would wipe every other partition, dynamic must keep them
    val saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      Seq((-1L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
        .write.mode("overwrite").partitionBy("c_mktsegment")
        .parquet(s"$base/c")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
    val after = spark.read.parquet(s"$base/c")
    assert(after.filter($"c_mktsegment" === "BUILDING").count() == 1)
    assert(after.filter($"c_mktsegment" =!= "BUILDING").count() == otherSegments,
      "dynamic overwrite clobbered untouched partitions")
  }

  test("malformed CSV rows route to the corrupt-record column, clean rows survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft-corrupt").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/rows.csv"),
      "1,alpha,10.5\n2,beta,not_a_number\n3,gamma,7.25\n".getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, score DOUBLE, _corrupt_record STRING")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(s"$base/rows.csv")
      .cache() // corrupt-record column requires the parsed row to be materialized
    assert(df.count() == 3)
    assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(df.filter($"_corrupt_record".isNull).select(sum($"score")).as[Double].head() == 17.75)
  }

  test("parquet schema evolution: appended column readable via mergeSchema") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Files.createTempDirectory("graft-evolve").toString
    val v1 = customers().select($"c_custkey", $"c_name")
    v1.write.parquet(s"$base/t")
    // later writer adds a column; old files stay untouched
    val v2 = customers().select($"c_custkey", $"c_name",
      lit("2024-01-01").as("ingest_date"))
    v2.write.mode("append").parquet(s"$base/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/t")
    assert(merged.columns.toSet == Set("c_custkey", "c_name", "ingest_date"))
    assert(merged.count() == 2 * v1.count())
    // rows from the old layout surface the new column as null
    assert(merged.filter($"ingest_date".isNull).count() == v1.count())
  }

  test("orc round-trip with partition keys and predicate pushdown") {
    val base = Files.createTempDirectory("graft-orc").toString
    val df = customers()
    Formats.writeOrc(df, s"$base/c", partitionBy = Seq("c_mktsegment"))
    val back = Formats.readOrc(spark, s"$base/c")
    assert(back.count() == df.count())
    assert(back.columns.toSet == df.columns.toSet)
    val cols = df.columns.sorted.toSeq.map(org.apache.spark.sql.functions.col)
    assert(back.select(cols: _*).exceptAll(df.select(cols: _*)).count() == 0)
    // ORC scans take pushed filters like parquet — assert, not assume
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      back.filter(org.apache.spark.sql.functions.col("c_custkey") < 10)
        .explain("formatted")
    }
    assert(out.toString.contains("PushedFilters"), out.toString)
  }

  test("csv round-trip with explicit schema (no inference scan)") {
    val base = Files.createTempDirectory("graft-fmt-csv").toString
    val df = customers()
    Formats.writeCsv(df, s"$base/c")
    val back = Formats.readCsv(spark, s"$base/c", df.schema)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).count() == 0)
  }

  test("json round-trip with explicit schema") {
    val base = Files.createTempDirectory("graft-fmt-json").toString
    val df = customers()
    Formats.writeJson(df, s"$base/c")
    val back = Formats.readJson(spark, s"$base/c", df.schema)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).count() == 0)
  }
}
