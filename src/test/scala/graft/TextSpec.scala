package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sketch-vs-exact checks for the text operators whose algorithms
  * have no SQL oracle.
  */
class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("approx_top_k terms carry exact counts and match the exact top-10 count set") {
    import spark.implicits._
    val sketch = graft.text.TextAnalysis.txtApproxTopk(spark, sf)
    val exact = graft.text.TextAnalysis.txtTermFreq(spark, sf)

    // every sketched item's count is the true count (capacity 10000
    // >> vocabulary, so the frequent-items sketch never undercounts)
    val trueCounts = graft.core.Tables.documents(spark, sf)
      .select($"lang", explode(expr("split(trim(text), ' +')")).as("word"))
      .groupBy($"lang", $"word").agg(count(lit(1)).as("true_n"))
    val wrong = sketch.join(trueCounts, Seq("lang", "word"))
      .filter($"n" =!= $"true_n").count()
    assert(wrong == 0)

    // per-lang count multisets agree with the exact top-10 (tie order
    // between equal-count words may differ — counts may not)
    val a = sketch.groupBy($"lang").agg(sort_array(collect_list($"n")).as("ns"))
    val b = exact.groupBy($"lang").agg(sort_array(collect_list($"n")).as("ns"))
    assert(a.join(b, Seq("lang")).filter(a("ns") =!= b("ns")).count() == 0)
    assert(sketch.count() == exact.count())
  }
}
