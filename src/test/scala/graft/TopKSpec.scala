package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The bounded-heap top-k aggregate must reproduce the window-based
  * (row_number) top-k exactly, while aggregating partially map-side
  * instead of sorting every candidate.
  */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("NaN scores rank LAST in both heap twins, never evicting real candidates") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 0.9), (2L, "b", Double.NaN), (3L, "c", 0.7),
      (4L, "d", 0.8), (5L, "e", Double.NaN))
      .toDF("id", "sid", "score")
    val longTop = rows
      .agg(graft.functions.TopK.topK(3)($"id", $"score").as("top"))
      .select(explode($"top._1")).as[Long].collect().toSeq
    assert(longTop == Seq(1L, 4L, 3L),
      s"NaN displaced a real candidate in graft_topk: $longTop")
    val strTop = rows
      .agg(graft.functions.TopK.topKStr(3)($"sid", $"score").as("top"))
      .select(explode($"top._1")).as[String].collect().toSeq
    assert(strTop == Seq("a", "d", "c"),
      s"NaN displaced a real candidate in graft_topk_str: $strTop")
    // with room beyond the real scores, NaN fills the tail (id order)
    val tail = rows
      .agg(graft.functions.TopK.topKStr(5)($"sid", $"score").as("top"))
      .select(explode($"top._1")).as[String].collect().toSeq
    assert(tail == Seq("a", "d", "c", "b", "e"), tail.toString)
  }

  test("heap top-k equals window top-k on brute-force cosine search") {
    import spark.implicits._
    val e = graft.core.Tables.embeddings(spark, sf)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .select($"vec_id", $"v")
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    // the window-sort reference implementation, built inline
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    val window = e.join(broadcast(q), $"query_id" =!= $"vec_id")
      .withColumn("cos", graft.functions.cosineSim($"qv", $"v"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
              round($"cos", 4).as("cosine"))

    val heap = graft.similarity.Similarity.simBruteTopk(spark, sf)
    assert(heap.count() == window.count() && heap.count() == 50)
    assert(heap.exceptAll(window).count() == 0)
    assert(window.exceptAll(heap).count() == 0)
  }

  test("string-keyed heap top-k equals the window formulation on term frequency") {
    import spark.implicits._
    val counts = graft.core.Tables.documents(spark, sf)
      .select($"lang", explode(expr("split(trim(text), ' +')")).as("word"))
      .groupBy($"lang", $"word")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n".desc, $"word")
    val window = counts.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"lang", $"word", $"n", $"rank")
      .collect().toSet
    val heap = graft.text.TextAnalysis.txtTermFreq(spark, sf).collect().toSet
    assert(heap == window, "string heap top-k diverges from window rank")
  }

  test("knn graph covers every vector and is exact within its cell") {
    import spark.implicits._
    val g = graft.similarity.Similarity.simKnnGraph(spark, sf)
    val e = graft.core.Tables.embeddings(spark, sf)
    assert(g.select($"vec_id").distinct().count() == e.count())
    assert(g.groupBy($"vec_id").count().filter($"count" =!= 5).count() == 0)
    // exactness within the cell, window-path reference, sample of vectors
    val v = e.withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .select($"label", $"vec_id", $"v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"cos".desc, $"nbr_id")
    val ref = v.join(v.select($"label", $"vec_id".as("nbr_id"), $"v".as("nv")), Seq("label"))
      .filter($"vec_id" =!= $"nbr_id" && $"vec_id" < 30)
      .withColumn("cos", graft.functions.cosineSim($"v", $"nv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"vec_id", $"nbr_id".as("neighbor_id"), $"rank",
              round($"cos", 4).as("cosine"))
    assert(g.filter($"vec_id" < 30).exceptAll(ref).count() == 0)
  }

  test("top-k aggregation is partial (map-side) — no global sort of candidates") {
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select(($"id" % 7).as("g"), $"id".as("id"),
              ($"id" % 131).cast("double").as("score"))
      .groupBy($"g")
      .agg(graft.functions.TopK.topK(3)($"id", $"score").as("top"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice (partial + final); no Sort
    // node anywhere below the aggregate
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Sort "), s"top-k fell back to a sort\n$p")
  }
}
