package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-12 continuation batch
  * (q11_important_stock, q_window_range, q_median_mad,
  * evt_interarrival, txt_zipf, dedup_boilerplate, mm_chunk_refcount,
  * mm_blob_pack — graph_jaccard's clique fixture lives in
  * DedupSimSpec). The oracle gate checks these operators against
  * DuckDB on the generated corpus; these pin the SEMANTICS on inputs
  * where the right answer is visible by hand — threshold edges,
  * frame boundaries, tie-breaks — which a shared misreading of the
  * spec on both engine and oracle sides would sail through.
  */
class ContinuationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("q11: strict > on the integer-division threshold; off-nation value excluded") {
    import spark.implicits._
    val dir = tmp("q11")
    Seq((10L, 3L), (20L, 1L))
      .toDF("s_suppkey", "s_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // nation-3 per-part value_cents: A=30000, B=20000, C=5
    //   → total 50005, threshold 50005 div 10000 = 5; C (=5) is NOT > 5
    // part D ships only via the nation-1 supplier → out of total AND output
    Seq(
      (1L, 100L, 10L, 300.00, 1.0),  // A
      (2L, 200L, 10L, 100.00, 2.0),  // B
      (3L, 300L, 10L, 0.05, 1.0),    // C — exactly the threshold
      (4L, 400L, 20L, 999.00, 9.0))  // D — wrong nation
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.q11ImportantStock(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 30000L), (200L, 20000L)))
  }

  test("q_window_range: the 90-day bound is inclusive, 91 days is out") {
    import spark.implicits._
    val dir = tmp("wrange")
    // cust 1 orders on days 0, 90, 91, 200 (cents 100, 200, 400, 800):
    //   d0→100; d90→300 (d0 exactly 90 days back: IN);
    //   d91→600 (d0 is 91 back: OUT); d200→800 ⇒ peak 800
    // cust 2 pins partition isolation: one order, peak = itself
    Seq((1L, 0, 100L), (1L, 90, 200L), (1L, 91, 400L), (1L, 200, 800L),
        (2L, 90, 700L))
      .toDF("o_custkey", "day", "cents")
      .withColumn("o_orderdate",
        expr("timestamp(date_add(date'1970-01-01', day))"))
      .withColumn("o_totalprice", $"cents" / 100.0)
      .select($"o_custkey", $"o_orderdate", $"o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.qWindowRange(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 800L, 4L), (2L, 700L, 1L)))
  }

  test("q_median_mad: lower-median convention on even and odd group sizes") {
    import spark.implicits._
    val dir = tmp("medmad")
    // URGENT (even n=4): cents 100,200,400,800 → median 200 (first cum
    //   with 2·cum ≥ 4), devs {100,0,200,600} → MAD 100
    // LOW (odd n=3): cents 100,200,300 → median 200, devs {100,0,100}
    //   → dev hist 0×1,100×2; 2·cum≥3 first at 100 → MAD 100
    val rows = Seq(
      ("1-URGENT", 1.00), ("1-URGENT", 2.00), ("1-URGENT", 4.00),
      ("1-URGENT", 8.00),
      ("5-LOW", 1.00), ("5-LOW", 2.00), ("5-LOW", 3.00))
    rows.toDF("o_orderpriority", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.qMedianMad(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("1-URGENT", 200L, 100L, 4L), ("5-LOW", 200L, 100L, 3L)))
  }

  test("evt_interarrival: strict-< bucket edges, gap typed by the LATER event") {
    import spark.implicits._
    val dir = tmp("gaps")
    // user 1 timeline (µs): 0 → +0.5s(a) → +1s(b: exactly 1s is NOT
    // <1s) → +10s(c) → +60s(d) → +600s(e) — each gap lands exactly ON
    // a bucket edge, pinning every strict-< comparison; the first
    // event contributes no gap. event_id breaks the t=0 tie for user 2.
    val us = Seq(
      (100L, 0L, 1L, "x"), (101L, 500000L, 1L, "a"),
      (102L, 1500000L, 1L, "b"), (103L, 11500000L, 1L, "c"),
      (104L, 71500000L, 1L, "d"), (105L, 671500000L, 1L, "e"),
      // user 2: two events at the SAME µs → order by event_id, gap 0
      (200L, 42L, 2L, "x"), (201L, 42L, 2L, "a"))
    us.toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros($"us"))
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Events.evtInterarrival(spark, dir)
      .select($"event_type", $"bucket", $"n_gaps", $"min_gap_us",
              $"max_gap_us")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "a_lt_1s", 2L, 0L, 500000L), // user-2 zero gap folds in
      ("b", "b_1_10s", 1L, 1000000L, 1000000L),
      ("c", "c_10_60s", 1L, 10000000L, 10000000L),
      ("d", "d_1_10min", 1L, 60000000L, 60000000L),
      ("e", "e_ge_10min", 1L, 600000000L, 600000000L)))
  }

  test("txt_zipf: integer-moment slope on a 3-rank corpus") {
    import spark.implicits._
    val dir = tmp("zipf")
    // one source: a×4, b×2, c×1 → ranks 1,2,3; e3 points
    // x=[0,693,1099], y=[1386,693,0] ⇒ slope_neg_e4 =
    // (10000·(sx·sy − n·sxy)) div (n·sxx − sx²) = 12331 (≈ −1.23)
    writeDocs(dir, Seq((1L, "a a b c", "src0"), (2L, "a a b", "src0")))
    val got = graft.text.TextAnalysis.txtZipf(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("src0", 3L, 12331L)))
  }

  test("dedup_boilerplate: ≥5 distinct docs, EVERY occurrence removed") {
    import spark.implicits._
    val dir = tmp("boiler")
    val X = (1 to 10).map(i => s"x$i").mkString(" ")
    val Y = (1 to 10).map(i => s"y$i").mkString(" ")
    writeDocs(dir,
      // X in 6 distinct docs (1–4, 5 twice, 10) → boilerplate;
      // doc 5 holds X twice: distinct-doc count sees it once, the
      // occurrence count twice. Y in 4 docs → below the gate.
      Seq((1L, X, "src0"), (2L, X, "src0"), (3L, X, "src0"),
          (4L, X, "src0"), (5L, s"$X $X", "src0"),
          (6L, Y, "src0"), (7L, Y, "src0"), (8L, Y, "src0"),
          (9L, Y, "src0"),
          (10L, X, "src1")))
    val got = graft.dedup.Dedup.dedupBoilerplate(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    // src0: 10 blocks total (6×X + 4×Y), 6 boilerplate → 6000 bp
    assert(got == Set(("src0", 10L, 6L, 6000L), ("src1", 1L, 1L, 10000L)))
  }

  test("mm_chunk_refcount: shared chunk counts once per occurrence") {
    import spark.implicits._
    val dir = tmp("refcount")
    val A = "A" * 64; val B = "B" * 64
    // chunks: A×2 (doc 1; doc 2 head), B×1 (doc 2 tail), "CCC"×1
    writeDocs(dir, Seq((1L, A, "src0"), (2L, A + B, "src0"),
                       (3L, "CCC", "src0")))
    val got = graft.multimodal.Multimodal.mmChunkRefcount(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L),    // B and CCC unique: no dup bytes
                      (2L, 1L, 64L)))  // A stored once, 64 bytes saved
  }

  test("mm_blob_pack: archive = the 4096-byte window the FIRST byte lands in") {
    import spark.implicits._
    val dir = tmp("blobpack")
    // doc_id order within (src0, shard 0): 3000 + 2000 + 4000 bytes
    //   doc 1 at offset 0    → archive 0
    //   doc 2 at offset 3000 → archive 0 (first byte < 4096)
    //   doc 3 at offset 5000 → archive 1
    writeDocs(dir, Seq((1L, "a" * 3000, "src0"), (2L, "b" * 2000, "src0"),
                       (3L, "c" * 4000, "src0")))
    val got = graft.multimodal.Multimodal.mmBlobPack(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("src0", 0L, 0L, 2L, 5000L, 3000L),
      ("src0", 0L, 1L, 1L, 4000L, 4000L)))
  }

  test("chunking: exact-fit doc is ONE chunk, n=65 forces two, strides cover the tail") {
    import spark.implicits._
    val dir = tmp("chunk")
    def toks(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")
    // 64 tokens = exactly one chunk (no fully-contained tail chunk);
    // 65 = the +1 token forces a second, overlapping suffix chunk;
    // 113 = 64 + 48 + 1 → three chunks at starts 1/49/97, last is 17
    writeDocs(dir, Seq((1L, toks(64), "s"), (2L, toks(65), "s"),
                       (3L, toks(113), "s"), (4L, toks(64), "s")))
    val rows = graft.operators.Analytics.pipelineChunk(spark, dir)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_toks")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows == Set(
      (1L, 0L, 1L, 64L),
      (2L, 0L, 1L, 64L), (2L, 1L, 49L, 17L),
      (3L, 0L, 1L, 64L), (3L, 1L, 49L, 64L), (3L, 2L, 97L, 17L),
      (4L, 0L, 1L, 64L)))
    // identical content → identical fingerprint (the dedup contract),
    // and the distinct 65-token doc hashes differently
    val hashes = graft.operators.Analytics.pipelineChunk(spark, dir)
      .filter($"chunk_idx" === 0)
      .select($"doc_id", $"chunk_hash").as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(4L) && hashes(1L) == hashes(2L))
    assert(hashes.values.forall(_ >= 0L))
  }

  test("expectations: seeded violations are counted per constraint, clean checks report zero") {
    import spark.implicits._
    val dir = tmp("expect")
    // documents: doc 2 duplicated (key_dup 1), doc 3 lies about
    // n_chars, doc 4 carries an out-of-domain lang
    Seq((1L, "ok text", "en", "s", 7L), (2L, "dup", "en", "s", 3L),
        (2L, "dup", "en", "s", 3L), (3L, "drift", "en", "s", 99L),
        (4L, "bad lang", "xx", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, 100.0), (2L, 0.0))  // order 2 violates price > 0
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("o_orderdate", timestamp_seconds(lit(0L)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L, 1L, "click", 1.0), (2L, 20L, 1L, "view", -0.5))
      .toDF("event_id", "epoch_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds($"epoch_s")).drop("epoch_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Analytics.pipelineExpectations(spark, dir)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("documents", "key_null", 5L, 0L),
      ("documents", "key_dup", 5L, 1L),
      ("documents", "text_empty", 5L, 0L),
      ("documents", "lang_domain", 5L, 1L),
      ("documents", "nchars_drift", 5L, 1L),
      ("orders", "key_null", 2L, 0L),
      ("orders", "key_dup", 2L, 0L),
      ("orders", "price_positive", 2L, 1L),
      ("orders", "date_null", 2L, 0L),
      ("events", "key_null", 2L, 0L),
      ("events", "key_dup", 2L, 0L),
      ("events", "type_domain", 2L, 0L),
      ("events", "value_nonneg", 2L, 1L),
      ("events", "ts_null", 2L, 0L)))
  }
}
