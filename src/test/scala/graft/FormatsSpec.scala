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
