package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.{AnnIndex, Similarity}
import graft.streaming.AnnIngest

/** Persisted ANN index (round-8 verdict item 4+5): the stored IVFADC
  * artifact must answer queries identically to the recompute-per-query
  * operator, appends must be batching-invariant and corpus-independent
  * (the frozen-quantizer contract), and the streaming ingest twin must
  * leave exactly the batch-built index state at every prefix.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def vecs(): DataFrame = {
    import spark.implicits._
    graft.core.Tables.embeddings(spark, sf)
      .withColumn("v", $"embedding".cast("array<double>"))
      .select($"vec_id", $"label", $"v")
  }

  private def codeRows(idx: String) = {
    import spark.implicits._
    AnnIndex.readCodes(spark, idx)
      .select($"vec_id", $"label", $"m", $"code")
      .as[(Long, Long, Int, Int)].collect().toSet
  }

  private def assertSameResult(got: DataFrame, want: DataFrame,
                               clue: String): Unit = {
    assert(got.count() == want.count(), s"$clue: row counts differ")
    assert(got.exceptAll(want).count() == 0 &&
           want.exceptAll(got).count() == 0, s"$clue: results differ")
  }

  test("stored-index query == recompute-per-query simIvfPqAnn") {
    val idx = Files.createTempDirectory("graft-ann").toString + "/index"
    AnnIndex.seed(vecs(), idx)
    val got = AnnIndex.query(spark, idx,
      Similarity.defaultQueries(spark, sf), excludeSelf = true)
    val want = Similarity.simIvfPqAnn(spark, sf)
    assertSameResult(got, want, "stored vs recompute")
    // the query path reads ONLY the stored artifacts: it must work
    // with the raw corpus gone (the build/query split IS the operator)
    assert(got.schema.fieldNames.toSeq ==
      Seq("query_id", "neighbor_id", "rank", "approx_score"))
  }

  test("appends are batching-invariant and codes corpus-independent") {
    import spark.implicits._
    val all = vecs()
    val seedPart = all.filter($"vec_id" % 4 =!= 0)
    val b1 = all.filter($"vec_id" % 8 === 0)
    val b2 = all.filter($"vec_id" % 4 === 0 && $"vec_id" % 8 =!= 0)
    assert(b1.count() > 0 && b2.count() > 0)

    val root = Files.createTempDirectory("graft-ann-append").toString
    // grown two ways: two appends vs one
    AnnIndex.seed(seedPart, s"$root/a")
    AnnIndex.append(b1, s"$root/a", 0)
    AnnIndex.append(b2, s"$root/a", 1)
    AnnIndex.seed(seedPart, s"$root/b")
    AnnIndex.append(b1.union(b2), s"$root/b", 0)
    assert(codeRows(s"$root/a") == codeRows(s"$root/b"),
      "append batching changed the stored codes")
    // sign codes are corpus-independent: the grown index holds exactly
    // the code rows a from-scratch seed of the full corpus would
    // (only the trained means differ — re-training is the scheduled
    // job, not the ingest path)
    AnnIndex.seed(all, s"$root/c")
    assert(codeRows(s"$root/a") == codeRows(s"$root/c"),
      "grown codes differ from a from-scratch build")
    // same frozen quantizers + same codes → identical query answers
    val q = Similarity.defaultQueries(spark, sf)
    assertSameResult(
      AnnIndex.query(spark, s"$root/a", q, excludeSelf = true),
      AnnIndex.query(spark, s"$root/b", q, excludeSelf = true),
      "batching-dependent query answers")
  }

  test("streamed ingest == batch-appended index at each prefix; replay idempotent") {
    import spark.implicits._
    val all = vecs()
    val seedPart = all.filter($"vec_id" % 4 =!= 0)
    val b1 = all.filter($"vec_id" % 8 === 0)
    val b2 = all.filter($"vec_id" % 4 === 0 && $"vec_id" % 8 =!= 0)

    val root = Files.createTempDirectory("graft-ann-stream").toString
    val (inDir, idx, ckpt) = (s"$root/in", s"$root/index", s"$root/ckpt")
    AnnIndex.seed(seedPart, idx)
    val seedRows = AnnIndex.readCodes(spark, idx).count()
    assert(seedRows == seedPart.count() * 8) // 8 code rows per vector

    // batch twin grown with the same prefixes
    AnnIndex.seed(seedPart, s"$root/twin")

    b1.coalesce(1).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val q1 = AnnIngest.start(
      spark.readStream.schema(schema).parquet(inDir), idx, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    AnnIndex.append(b1, s"$root/twin", 0)
    assert(codeRows(idx) == codeRows(s"$root/twin"),
      "streamed state diverged from batch append after batch 1")

    // replay: a second stream over the SAME input with a fresh
    // checkpoint re-runs micro-batch 0 (the post-crash recovery
    // shape: sink committed, checkpoint didn't) — dynamic partition
    // overwrite rewrites identical rows, never double-appends
    val rows = AnnIndex.readCodes(spark, idx).count()
    val q2 = AnnIngest.start(
      spark.readStream.schema(schema).parquet(inDir), idx, s"$root/ckpt2")
    try q2.processAllAvailable() finally q2.stop()
    assert(AnnIndex.readCodes(spark, idx).count() == rows,
      "replay double-appended code rows")

    // resume from the ORIGINAL checkpoint: new data arrives as the
    // next micro-batch and only that batch is processed
    b2.coalesce(1).write.mode("append").parquet(inDir)
    val q3 = AnnIngest.start(
      spark.readStream.schema(schema).parquet(inDir), idx, ckpt)
    try q3.processAllAvailable() finally q3.stop()
    AnnIndex.append(b2, s"$root/twin", 1)
    assert(codeRows(idx) == codeRows(s"$root/twin"),
      "streamed state diverged from batch append after batch 2")

    // queries against the streamed index == the full-corpus stored
    // answer (same frozen quantizers? no — the twin froze on seedPart;
    // assert against the twin, the like-for-like comparison)
    assertSameResult(
      AnnIndex.query(spark, idx, Similarity.defaultQueries(spark, sf),
        excludeSelf = true),
      AnnIndex.query(spark, s"$root/twin", Similarity.defaultQueries(spark, sf),
        excludeSelf = true),
      "streamed-index query answers")
  }

  test("code compaction folds batch partitions, preserves rows, answers unchanged") {
    import spark.implicits._
    val all = vecs()
    val seedPart = all.filter($"vec_id" % 4 =!= 0)
    val b1 = all.filter($"vec_id" % 4 === 0)
    val root = Files.createTempDirectory("graft-ann-compact").toString
    val idx = s"$root/index"
    AnnIndex.seed(seedPart, idx)
    AnnIndex.append(b1, idx, 0)
    val before = codeRows(idx)
    val beforeAnswer = AnnIndex.query(spark, idx,
      Similarity.defaultQueries(spark, sf), excludeSelf = true)
      .collect().toSet
    AnnIndex.compactCodes(spark, idx)
    assert(codeRows(idx) == before, "compaction lost or mutated code rows")
    assert(AnnIndex.readCodes(spark, idx)
      .select($"ingest_batch").distinct().as[Long].collect().toSeq == Seq(-1L),
      "compaction left non-base partitions")
    assert(AnnIndex.query(spark, idx,
      Similarity.defaultQueries(spark, sf), excludeSelf = true)
      .collect().toSet == beforeAnswer, "compaction changed query answers")
  }

  test("deletes tombstone immediately, compaction realizes them physically") {
    import spark.implicits._
    val all = vecs()
    val idx = Files.createTempDirectory("graft-ann-del").toString + "/index"
    AnnIndex.seed(all, idx)
    val q = Similarity.defaultQueries(spark, sf)
    // delete every answer of the pre-delete query — the strongest
    // visible effect: NONE of them may be returned again
    val victims = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .select($"neighbor_id".as("vec_id")).distinct()
    val victimIds = victims.as[Long].collect().toSet
    AnnIndex.delete(victims, idx, batchId = 0)
    // deleted ids are gone (NOT compared against a re-seeded scratch
    // index: re-seeding RETRAINS the quantizers on the reduced corpus
    // — the frozen-quantizer contract means a deletion must not; the
    // independent twin here is the post-compaction PHYSICAL path below)
    // materialize NOW: the plan reads tombstone files that the
    // compaction below deletes — a lazy re-collect would re-scan them
    val after = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet
    assert(!after.exists(r => victimIds.contains(r.getLong(1))),
      "a deleted vector still scored")
    // every query still gets answers (the index is not just smaller
    // by accident of returning nothing)
    assert(after.map(_.getLong(0)).size > 0 &&
      after.map(_.getLong(0)) == q.select($"query_id").distinct()
        .collect().map(_.getLong(0)).toSet, "a query lost all answers")
    // replaying the same delete batch is a no-op (idempotent)
    AnnIndex.delete(victims, idx, batchId = 0)
    assert(AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet == after, "delete replay drifted")
    // compaction drops the dead rows physically and clears tombstones;
    // the physical path must answer exactly like the anti-join path —
    // the two independent delete mechanisms agreeing IS the contract
    AnnIndex.compactCodes(spark, idx)
    assert(AnnIndex.readTombstones(spark, idx).isEmpty,
      "compaction left tombstones behind")
    assert(codeRows(idx).forall { case (id, _, _, _) =>
      !victimIds.contains(id) }, "compaction kept tombstoned code rows")
    assert(AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet == after,
      "physical-delete answers differ from tombstone-path answers")
  }

  test("a re-appended vec_id shadows its older tombstone (LSM as-of sequencing)") {
    import spark.implicits._
    val all = vecs()
    val idx = Files.createTempDirectory("graft-ann-readd").toString + "/index"
    AnnIndex.seed(all, idx)
    val q = Similarity.defaultQueries(spark, sf)
    val victims = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .select($"neighbor_id".as("vec_id")).distinct()
    val victimIds = victims.as[Long].collect().toSet
    val baseline = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet
    AnnIndex.delete(victims, idx, batchId = 0)
    // re-add the deleted vectors in a LATER ingest batch: the
    // tombstone masks only writes at or before its as-of mark, so the
    // newer rows must score — this is an UPDATE, not a masked write
    AnnIndex.append(all.join(victims, Seq("vec_id"), "left_semi"), idx, 7)
    val readded = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet
    assert(readded == baseline,
      "delete→re-append did not restore the pre-delete answers")
    // each surviving vector contributes exactly one code row per
    // subspace (the old masked copy is gone, not double-counted)
    AnnIndex.compactCodes(spark, idx)
    val perVec = AnnIndex.readCodes(spark, idx)
      .groupBy($"vec_id").agg(count(lit(1)).as("n"))
      .select($"n").distinct().as[Long].collect().toSeq
    assert(perVec == Seq(8L), s"code-row multiplicity after compact: $perVec")
    // compaction physically kept the re-added rows (the ADVICE bug:
    // compact dropped them, then cleared the tombstone)
    assert(victimIds.subsetOf(AnnIndex.readCodes(spark, idx)
      .select($"vec_id").distinct().as[Long].collect().toSet),
      "compaction dropped re-added vectors")
    assert(AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet == baseline,
      "post-compaction answers differ from pre-delete baseline")
  }

  test("SQ8 stored-index query == recompute-per-query simIvfSq") {
    val idx = Files.createTempDirectory("graft-ann-sq").toString + "/index"
    AnnIndex.seedSq(vecs(), idx)
    val got = AnnIndex.querySq(spark, idx,
      Similarity.defaultQueries(spark, sf), excludeSelf = true)
    val want = Similarity.simIvfSq(spark, sf)
    assertSameResult(got, want, "sq stored vs recompute")
  }

  test("SQ8 appends quantize with the FROZEN ranges; batching-invariant; delete/compact shared") {
    import spark.implicits._
    val all = vecs()
    val seedPart = all.filter($"vec_id" % 4 =!= 0)
    val b1 = all.filter($"vec_id" % 8 === 0)
    val b2 = all.filter($"vec_id" % 4 === 0 && $"vec_id" % 8 =!= 0)
    val root = Files.createTempDirectory("graft-ann-sq-append").toString
    def sqCodeRows(idx: String) =
      spark.read.parquet(s"$idx/codes")
        .select($"vec_id", $"label", $"cc")
        .as[(Long, Long, Seq[Int])].collect().toSet
    // grown two ways → identical stored codes and answers
    AnnIndex.seedSq(seedPart, s"$root/a")
    AnnIndex.appendSq(b1, s"$root/a", 0)
    AnnIndex.appendSq(b2, s"$root/a", 1)
    AnnIndex.seedSq(seedPart, s"$root/b")
    AnnIndex.appendSq(b1.union(b2), s"$root/b", 0)
    assert(sqCodeRows(s"$root/a") == sqCodeRows(s"$root/b"),
      "append batching changed the stored SQ codes")
    // frozen-model contract: the grown index's codes DIFFER from a
    // from-scratch seed of the full corpus (which retrains the
    // ranges on all vectors) — the opposite of the PQ sign codes,
    // and exactly why the ranges are a persisted artifact
    AnnIndex.seedSq(all, s"$root/c")
    assert(sqCodeRows(s"$root/a") != sqCodeRows(s"$root/c"),
      "SQ codes unexpectedly corpus-independent (frozen ranges unused?)")
    val q = Similarity.defaultQueries(spark, sf)
    assertSameResult(
      AnnIndex.querySq(spark, s"$root/a", q, excludeSelf = true),
      AnnIndex.querySq(spark, s"$root/b", q, excludeSelf = true),
      "batching-dependent SQ query answers")
    // the shared delete/compaction machinery: tombstoned ids stop
    // scoring, and compaction physically drops them from BOTH the
    // codes and the rerank vector store, answers unchanged
    val idx = s"$root/a"
    val victims = AnnIndex.querySq(spark, idx, q, excludeSelf = true)
      .select($"neighbor_id".as("vec_id")).distinct()
    val victimIds = victims.as[Long].collect().toSet
    AnnIndex.delete(victims, idx, batchId = 0)
    val after = AnnIndex.querySq(spark, idx, q, excludeSelf = true)
      .collect().toSet
    assert(!after.exists(r => victimIds.contains(r.getLong(1))),
      "a deleted vector still scored in the SQ index")
    AnnIndex.compactCodes(spark, idx)
    assert(AnnIndex.readTombstones(spark, idx).isEmpty)
    assert(sqCodeRows(idx).forall { case (id, _, _) => !victimIds.contains(id) },
      "compaction kept tombstoned SQ code rows")
    assert(spark.read.parquet(s"$idx/vectors")
      .select($"vec_id").as[Long].collect().toSet
      .intersect(victimIds).isEmpty,
      "compaction kept tombstoned vector-store rows")
    assert(AnnIndex.querySq(spark, idx, q, excludeSelf = true)
      .collect().toSet == after,
      "SQ physical-delete answers differ from tombstone-path answers")
  }

  test("Matryoshka stored query == recompute twin; one artifact, two strategies") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-ann-mat").toString + "/index"
    AnnIndex.seedSq(vecs(), idx)
    val q = Similarity.defaultQueries(spark, sf)
    assertSameResult(
      AnnIndex.queryMatryoshka(spark, idx, q, excludeSelf = true),
      Similarity.simMatryoshka(spark, sf),
      "matryoshka stored vs recompute")
    // the SAME artifact serves the SQ strategy too (the one-store/
    // many-indexes serving shape), and deletes mask both strategies
    val victims = AnnIndex.queryMatryoshka(spark, idx, q, excludeSelf = true)
      .select($"neighbor_id".as("vec_id")).distinct()
    val victimIds = victims.as[Long].collect().toSet
    AnnIndex.delete(victims, idx, batchId = 0)
    assert(!AnnIndex.queryMatryoshka(spark, idx, q, excludeSelf = true)
      .collect().exists(r => victimIds.contains(r.getLong(1))),
      "a deleted vector still scored in the matryoshka path")
    assert(!AnnIndex.querySq(spark, idx, q, excludeSelf = true)
      .collect().exists(r => victimIds.contains(r.getLong(1))),
      "a deleted vector still scored in the sq path")
  }

  test("legacy tombstones (no as_of_batch) still open and mask every batch") {
    import spark.implicits._
    val all = vecs()
    val idx = Files.createTempDirectory("graft-ann-legacy").toString + "/index"
    AnnIndex.seed(all, idx)
    val q = Similarity.defaultQueries(spark, sf)
    val victims = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .select($"neighbor_id".as("vec_id")).distinct()
    val victimIds = victims.as[Long].collect().toSet
    // simulate a tombstone artifact written by the pre-sequencing
    // format: (vec_id, delete_batch) only — must read back as an
    // everything-masking tombstone, not throw
    victims.withColumn("delete_batch", lit(0L))
      .write.partitionBy("delete_batch").parquet(s"$idx/tombstones")
    val after = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet
    assert(!after.exists(r => victimIds.contains(r.getLong(1))),
      "legacy tombstone did not mask")
    AnnIndex.compactCodes(spark, idx)
    assert(AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet == after, "legacy-tombstone compaction drifted")
  }

  test("MIXED legacy + sequenced tombstones: per-row back-compat (mergeSchema)") {
    import spark.implicits._
    val all = vecs()
    val idx = Files.createTempDirectory("graft-ann-mixed").toString + "/index"
    AnnIndex.seed(all, idx)
    val q = Similarity.defaultQueries(spark, sf)
    val answers = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .select($"neighbor_id".as("vec_id")).distinct()
      .as[Long].collect().toSet.toSeq.sorted
    assert(answers.size >= 2, "need at least two distinct answers")
    val (legacyVictim, seqVictim) = (answers.head, answers.last)
    // one LEGACY tombstone file (no as_of_batch) …
    Seq(legacyVictim).toDF("vec_id")
      .withColumn("delete_batch", lit(0L))
      .write.partitionBy("delete_batch").parquet(s"$idx/tombstones")
    // … next to one SEQUENCED delete in the same directory — the mix
    // the single-footer schema read resolved nondeterministically
    // (legacy rows nulled → stop masking, or the column dropped →
    // sequenced marks widen to mask-everything)
    AnnIndex.delete(Seq(seqVictim).toDF("vec_id"), idx, batchId = 1)
    val after = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet
    assert(!after.exists(r => r.getLong(1) == legacyVictim),
      "legacy tombstone stopped masking in a mixed directory")
    assert(!after.exists(r => r.getLong(1) == seqVictim),
      "sequenced tombstone stopped masking in a mixed directory")
    // the sequenced mark kept its LSM semantics: a later re-append of
    // the sequenced victim scores again (its mark did not widen to
    // the legacy mask-everything MaxValue)
    AnnIndex.append(
      all.filter($"vec_id" === seqVictim), idx, batchId = 5)
    assert(AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().exists(r => r.getLong(1) == seqVictim),
      "re-appended sequenced victim stayed masked (mark widened?)")
    // and compaction under the mixed set realizes the same visibility
    val preCompact = AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet
    AnnIndex.compactCodes(spark, idx)
    assert(AnnIndex.query(spark, idx, q, excludeSelf = true)
      .collect().toSet == preCompact, "mixed-tombstone compaction drifted")
  }

  test("append batch ids must be monotonic; latest-batch replay stays legal") {
    import spark.implicits._
    val all = vecs()
    val seedPart = all.filter($"vec_id" % 4 =!= 0)
    val b1 = all.filter($"vec_id" % 4 === 0)
    val idx = Files.createTempDirectory("graft-ann-mono").toString + "/index"
    AnnIndex.seed(seedPart, idx)
    AnnIndex.append(b1, idx, 3)
    // replay of the LATEST batch id is the at-least-once recovery
    // case — allowed
    AnnIndex.append(b1, idx, 3)
    // a STALE id at or below an existing tombstone mark would be
    // silently masked — rejected at write time instead
    intercept[IllegalArgumentException] {
      AnnIndex.append(b1, idx, 1)
    }
    val sq = Files.createTempDirectory("graft-ann-mono-sq").toString + "/index"
    AnnIndex.seedSq(seedPart, sq)
    AnnIndex.appendSq(b1, sq, 2)
    intercept[IllegalArgumentException] {
      AnnIndex.appendSq(b1, sq, 0)
    }
  }

  test("delete-everything then compact leaves a readable empty index") {
    import spark.implicits._
    val all = vecs()
    val idx = Files.createTempDirectory("graft-ann-empty").toString + "/index"
    AnnIndex.seed(all, idx)
    AnnIndex.delete(all.select($"vec_id"), idx, batchId = 0)
    AnnIndex.compactCodes(spark, idx)
    // the codes directory must still be schema-readable (a zero-row
    // partitionBy write emits no parquet files at all — the edge this
    // guards) and a query must return empty, not throw
    assert(AnnIndex.readCodes(spark, idx).count() == 0)
    assert(AnnIndex.query(spark, idx,
      Similarity.defaultQueries(spark, sf), excludeSelf = true).count() == 0)
    // the empty index is still appendable and then answers queries
    AnnIndex.append(all, idx, 1)
    assert(AnnIndex.query(spark, idx,
      Similarity.defaultQueries(spark, sf), excludeSelf = true).count() > 0,
      "re-grown index returned no answers")
  }
}
