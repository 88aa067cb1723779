package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.{AnnIndex, Similarity}

/** NSW graph-traversal ANN (round-12 verdict item 4): hand-built
  * traversal fixtures pinning the beam-search semantics (hop bound,
  * unseen-only scoring, tie-breaks), recall vs brute force at least
  * the IVF family's, and the stored-artifact contract (parity with
  * the recompute twin, append reachability via back-links, tombstone
  * masking, replay idempotence).
  */
class NswSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def vecs(): DataFrame = {
    import spark.implicits._
    graft.core.Tables.embeddings(spark, sf)
      .withColumn("v", $"embedding".cast("array<double>"))
      .select($"vec_id", $"label", $"v")
  }

  /** n unit vectors on a quarter circle: vec i at angle i·(π/2)/(n−1),
    * so cosine similarity strictly decreases with angular distance —
    * the right answer is visible by construction.
    */
  private def arc(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val t = i * (math.Pi / 2) / (n - 1)
      (i.toLong, 0L, Seq(math.cos(t), math.sin(t)))
    }.toDF("vec_id", "label", "v")
  }

  private def chainEdges(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n - 1).map(i => (i.toLong, 0L, (i + 1).toLong))
      .toDF("vec_id", "label", "neighbor_id")
  }

  private def queryAt(vs: DataFrame, id: Long): DataFrame = {
    import spark.implicits._
    vs.filter($"vec_id" === id)
      .select(lit(100L).as("query_id"), $"v".as("qv"))
  }

  test("beam search walks the chain exactly `hops` edges from the entry") {
    import spark.implicits._
    // chain 0-1-…-8, entry pinned at node 0, query = node 8's vector.
    // cosine to the query INCREASES along the chain, so greedy search
    // advances one frontier per hop: with hops=8 the search must find
    // node 8 at rank 1; with hops=3 it can only have seen 0..3.
    val vs = arc(9)
    val entry = Seq(0L).toDF("vec_id")
    val got8 = Similarity.nswSearch(vs, chainEdges(9), entry,
        queryAt(vs, 8L), excludeSelf = false,
        beamWidth = 4, hops = 8, kOut = 3)
      .select($"neighbor_id", $"rank")
      .as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got8.head == ((8L, 1)), s"hops=8 should reach node 8: $got8")
    assert(got8.map(_._1) == Seq(8L, 7L, 6L), got8.toString)
    val got3 = Similarity.nswSearch(vs, chainEdges(9), entry,
        queryAt(vs, 8L), excludeSelf = false,
        beamWidth = 4, hops = 3, kOut = 3)
      .select($"neighbor_id", $"rank")
      .as[(Long, Int)].collect().toSeq.sortBy(_._2)
    // after 3 hops only nodes 0..3 were reachable — best is node 3
    assert(got3.map(_._1) == Seq(3L, 2L, 1L), got3.toString)
  }

  test("beam width bounds the frontier: a too-narrow beam loses branches") {
    import spark.implicits._
    // star: node 0 links to 1..6; node 6 (the best) links to 7 (the
    // true answer). With beamWidth=2 and the beam seeded at 0, hop 1
    // keeps only the two best of 1..6 — node 6 survives, so hop 2
    // finds 7. Pins that expansion is beam-wide, not frontier-wide.
    val vs = arc(8)
    val edges = ((0 until 7).map(i => (0L, 0L, (i + 1).toLong)) :+
      ((6L, 0L, 7L))).toDF("vec_id", "label", "neighbor_id")
    val got = Similarity.nswSearch(vs, edges, Seq(0L).toDF("vec_id"),
        queryAt(vs, 7L), excludeSelf = false,
        beamWidth = 2, hops = 2, kOut = 2)
      .select($"neighbor_id", $"rank").as[(Long, Int)]
      .collect().toSeq.sortBy(_._2)
    assert(got.map(_._1) == Seq(7L, 6L), got.toString)
  }

  test("ties in cosine break by ascending vec_id (the TopK contract)") {
    import spark.implicits._
    // two vectors IDENTICAL to the query (cos = 1 with ids 3 and 1)
    // — rank order must be id-ascending
    val vs = Seq(
      (0L, 0L, Seq(1.0, 0.0)),
      (1L, 0L, Seq(0.0, 1.0)),
      (3L, 0L, Seq(0.0, 1.0))).toDF("vec_id", "label", "v")
    val edges = Seq((0L, 0L, 1L), (0L, 0L, 3L))
      .toDF("vec_id", "label", "neighbor_id")
    val got = Similarity.nswSearch(vs, edges, Seq(0L).toDF("vec_id"),
        Seq((100L, Seq(0.0, 1.0))).toDF("query_id", "qv"),
        excludeSelf = false, beamWidth = 4, hops = 1, kOut = 2)
      .select($"neighbor_id", $"rank").as[(Long, Int)]
      .collect().toSeq.sortBy(_._2)
    assert(got == Seq((1L, 1), (3L, 2)), got.toString)
  }

  test("NSW recall vs brute force >= the IVF family's") {
    import spark.implicits._
    val brute = Similarity.simBruteTopk(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val nsw = recallOf(Similarity.simNswAnn(spark, sf))
    val ivf = recallOf(Similarity.simIvfAnn(spark, sf))
    info(s"NSW recall = $nsw, IVF recall = $ivf")
    assert(nsw >= ivf,
      s"graph index recall $nsw fell below IVF's $ivf")
    assert(nsw >= 0.5, s"NSW recall $nsw below the absolute floor")
  }

  test("stored-graph query == recompute-per-query simNswAnn") {
    val idx = Files.createTempDirectory("graft-nsw").toString + "/index"
    AnnIndex.seedNsw(vecs(), idx)
    val got = AnnIndex.queryNsw(spark, idx,
      Similarity.defaultQueries(spark, sf), excludeSelf = true)
    val want = Similarity.simNswAnn(spark, sf)
    assert(got.count() == want.count(), "row counts differ")
    assert(got.exceptAll(want).count() == 0 &&
           want.exceptAll(got).count() == 0, "stored vs recompute differ")
  }

  test("append back-links make inserted vectors reachable; replay idempotent") {
    import spark.implicits._
    val all = vecs()
    val held = all.filter($"vec_id" >= 10 && $"vec_id" % 7 === 0)
    assert(held.count() > 0)
    val idx = Files.createTempDirectory("graft-nsw-app").toString + "/index"
    AnnIndex.seedNsw(all.exceptAll(held), idx)
    AnnIndex.appendNsw(held, idx, 0)
    // every held-out vector must be findable when IT IS the query's
    // exact nearest neighbor: query with its own vector (excludeSelf
    // off, external query ids) — reachability via the back-links
    val q = held.limit(3)
      .select(($"vec_id" + 1000000L).as("query_id"), $"v".as("qv"))
    val got = AnnIndex.queryNsw(spark, idx, q)
    val wantIds = held.limit(3).select($"vec_id").as[Long].collect().toSet
    val top1 = got.filter($"rank" === 1)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(wantIds.subsetOf(top1),
      s"appended vectors not reachable at rank 1: want $wantIds got $top1")
    // at-least-once replay of the same batch id changes nothing
    val before = got.collect().toSet
    AnnIndex.appendNsw(held, idx, 0)
    val after = AnnIndex.queryNsw(spark, idx, q).collect().toSet
    assert(before == after, "append replay changed the stored answers")
  }

  test("deleting a cell's entry point cannot strand the cell") {
    import spark.implicits._
    // entries derive from the LIVE vector set at query time (they are
    // deliberately NOT an artifact): delete every CURRENT entry point
    // and the per-cell argmin must re-derive from the survivors, so
    // each cell still answers
    val idx = Files.createTempDirectory("graft-nsw-ent").toString + "/index"
    AnnIndex.seedNsw(vecs(), idx)
    val qs = Similarity.defaultQueries(spark, sf)
    val entriesNow = graft.similarity.Similarity.nswEntries(
      vecs()).as[Long].collect().toSeq
    // keep the query vectors themselves alive (they are corpus rows)
    val victims = entriesNow.filter(_ >= 10)
    assert(victims.nonEmpty)
    AnnIndex.delete(victims.toDF("vec_id"), idx, 0)
    val after = AnnIndex.queryNsw(spark, idx, qs, excludeSelf = true)
    assert(after.filter($"rank" === 1).count() == qs.count(),
      "some query lost its results after entry-point deletion")
    assert(after.join(victims.toDF("neighbor_id"), Seq("neighbor_id"))
      .count() == 0, "a deleted entry point was returned")
    // the re-derived entries avoid every tombstoned id
    val liveEntries = graft.similarity.Similarity.nswEntries(
        vecs().join(victims.toDF("vec_id"), Seq("vec_id"), "left_anti"))
      .as[Long].collect().toSet
    assert(liveEntries.intersect(victims.toSet).isEmpty)
  }

  test("deleting an APPENDED vector masks it (as-of mark covers vectors/)") {
    import spark.implicits._
    // regression for the r13 advisor's high finding: maxIngestBatch
    // read only codes/ — which an NSW index does not have — so a
    // tombstone's as_of_batch was always -1 and never masked a vector
    // appended at ingest_batch >= 0 (and appendNsw's monotonicity
    // check was a silent no-op). The mark must derive from the
    // family's authoritative directory (vectors/ when codes/ is
    // absent).
    val all = vecs()
    val held = all.filter($"vec_id" >= 10 && $"vec_id" % 11 === 0)
    assert(held.count() > 0)
    val idx = Files.createTempDirectory("graft-nsw-adel").toString + "/index"
    AnnIndex.seedNsw(all.exceptAll(held), idx)
    AnnIndex.appendNsw(held, idx, 3)
    val victim = held.select($"vec_id").as[Long].first()
    val q = held.filter($"vec_id" === victim)
      .select(lit(1000001L).as("query_id"), $"v".as("qv"))
    // sanity: the appended vector answers its own query at rank 1
    assert(AnnIndex.queryNsw(spark, idx, q)
      .filter($"rank" === 1 && $"neighbor_id" === victim).count() == 1)
    AnnIndex.delete(Seq(victim).toDF("vec_id"), idx, 4)
    assert(AnnIndex.queryNsw(spark, idx, q)
      .filter($"neighbor_id" === victim).count() == 0,
      s"tombstone failed to mask appended vector $victim")
    // monotonicity now sees the appended batches: reusing a LOWER id
    // must be rejected (it would be shadowed by the batch-4 tombstone)
    val err = intercept[IllegalArgumentException] {
      AnnIndex.appendNsw(held.limit(1), idx, 2)
    }
    assert(err.getMessage.contains("monotonic"))
  }

  test("deleted vectors are neither returned nor traversed through") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-nsw-del").toString + "/index"
    AnnIndex.seedNsw(vecs(), idx)
    val qs = Similarity.defaultQueries(spark, sf)
    val victim = AnnIndex.queryNsw(spark, idx, qs, excludeSelf = true)
      .filter($"rank" === 1).select($"neighbor_id").as[Long].first()
    AnnIndex.delete(Seq(victim).toDF("vec_id"), idx, 0)
    val after = AnnIndex.queryNsw(spark, idx, qs, excludeSelf = true)
    assert(after.filter($"neighbor_id" === victim).count() == 0,
      s"tombstoned vector $victim still returned")
    // compaction realizes the delete physically and answers unchanged
    val beforeCompact = after.collect().toSet
    AnnIndex.compactNsw(spark, idx)
    val afterCompact = AnnIndex.queryNsw(spark, idx, qs,
      excludeSelf = true).collect().toSet
    assert(beforeCompact == afterCompact,
      "compaction changed the stored answers")
  }
}
