package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("frame sampling partitions every blob into full-coverage frames") {
    import spark.implicits._
    val frames = Multimodal.mmFrameSample(spark, sf)
      .groupBy($"doc_id")
      .agg(sum($"frame_chars").as("covered"),
           count(lit(1)).as("n_frames"),
           max($"frame_idx").as("max_idx"))
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", length($"text").as("n_chars"))
    val joined = frames.join(docs, Seq("doc_id"))
    assert(joined.filter($"covered" =!= $"n_chars").count() == 0)
    assert(joined.filter($"n_frames" =!= ceil($"n_chars" / 64.0)).count() == 0)
    assert(joined.filter($"max_idx" =!= $"n_frames" - 1).count() == 0)
  }

  test("binary metadata totals match raw text sizes") {
    import spark.implicits._
    val total = Multimodal.mmBinaryMeta(spark, sf)
      .agg(sum($"total_bytes")).as[Long].head()
    val want = graft.core.Tables.documents(spark, sf)
      .agg(sum(length($"text"))).as[Long].head()
    assert(total == want)
  }

  test("mapPartitions batch decoder covers every doc deterministically") {
    import spark.implicits._
    val a = Multimodal.mmDecodeBatch(spark, sf)
    val b = Multimodal.mmDecodeBatch(spark, sf)
    assert(a.select($"doc_id").distinct().count() ==
      graft.core.Tables.documents(spark, sf).count())
    assert(a.exceptAll(b).count() == 0, "decoder output not deterministic")
    // typed mapPartitions decoder and expression pipeline agree frame
    // by frame: same frame count per doc, same chunk boundaries
    val frames = Multimodal.mmFrameSample(spark, sf)
      .groupBy($"doc_id").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val mismatched = a.groupBy($"doc_id", $"n_frames").count()
      .join(frames, Seq("doc_id"))
      .filter($"n_frames" =!= $"n").count()
    assert(mismatched == 0, "frame counts disagree with expression pipeline")
    val boundary = a.select($"doc_id", $"frame_idx",
        $"frame_chars".as("decode_chars"))
      .join(Multimodal.mmFrameSample(spark, sf)
        .select($"doc_id", $"frame_idx", $"frame_chars"),
        Seq("doc_id", "frame_idx"))
      .filter($"decode_chars" =!= $"frame_chars")
    assert(boundary.count() == 0, "chunk boundaries disagree")
  }

  test("phash clusters: hamming chains merge transitively, reps are minima") {
    import spark.implicits._
    // corpus pairs at the test SF are all disjoint (hamming-0 exact
    // clones), so the transitive-merge semantics need a synthetic
    // chain: h(1)~h(2)=3, h(2)~h(3)=3 but h(1)~h(3)=6 — all three
    // must land in ONE cluster; 5 and 6 are clones (one ≥2 group
    // with no external edge); 9 is an edge-less singleton (excluded)
    val hashed = Seq(
      (1L, 0L), (2L, 7L), (3L, 63L),
      (5L, 0x00FF0000000000L), (6L, 0x00FF0000000000L),
      (9L, 0x7700000000000000L ^ 0x33L))
      .toDF("doc_id", "phash")
    val got = Multimodal.phashClustersFromHashes(hashed)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 3L), (5L, 2L, 6L)))
    // corpus clusters: every cluster has >= 2 members and the rep is
    // always a member below max_doc_id
    val corpus = Multimodal.mmPhashClusters(spark, sf)
    assert(corpus.filter($"cluster_size" < 2 ||
      $"cluster_rep" >= $"max_doc_id").count() == 0)
  }
}
