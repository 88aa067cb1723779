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
