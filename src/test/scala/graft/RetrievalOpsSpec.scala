package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-12 session-5 batch
  * (q12_ship_lateness, txt_dsir_weights, sim_hybrid_rrf). As with
  * ContinuationOpsSpec, the oracle gate checks these against DuckDB
  * on the generated corpus; these pin the SEMANTICS — the strict
  * lateness boundary, the add-one-smoothed integer likelihood ratio,
  * the RRF fusion arithmetic and its rank tiebreaks — on inputs
  * where the right answer is computable by hand.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def writeDocs(dir: String,
                        rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("q12: exactly-60-days is NOT late (strict >); priority split") {
    import spark.implicits._
    val dir = tmp("q12")
    // order 1 URGENT placed day 0; order 2 LOW placed day 0
    Seq((1L, "1-URGENT"), (2L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
      .withColumn("o_orderdate", expr("timestamp(date'1970-01-01')"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lines: order 1 ships day 60 (NOT late: strict >) and day 61
    // (late, high); order 2 ships day 61 (late, low) — statuses split
    // the group axis
    Seq((1L, "O", 60), (1L, "O", 61), (2L, "O", 61), (2L, "F", 100))
      .toDF("l_orderkey", "l_linestatus", "day")
      .withColumn("l_shipdate",
        expr("timestamp(date_add(date'1970-01-01', day))"))
      .select($"l_orderkey", $"l_linestatus", $"l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.Relational.q12ShipLateness(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    // status O: 1 high (order-1 day-61) + 1 low (order-2 day-61);
    // the day-60 line is excluded. status F: 1 low.
    assert(got == Set(("O", 1L, 1L), ("F", 0L, 1L)))
  }

  test("txt_dsir_weights: add-one-smoothed integer ratio per bucket") {
    import spark.implicits._
    val dir = tmp("dsir")
    // distinct bigrams and their (c_src, c_tgt) with target lang=en:
    //   "w w": A(en)×2 + B(fr)×1 + D(fr)×1 → (4, 2) → (3·10⁴) div 5 = 6000
    //   "u u": C(en)×1 + D(fr)×1          → (2, 1) → (2·10⁴) div 3 = 6666
    //   "w u": D(fr)×1                    → (1, 0) → (1·10⁴) div 2 = 5000
    // doc scores (score_sum div n_bigrams):
    //   A: 12000 div 2 = 6000   B: 6000   C: 6666
    //   D ("w w","w u","u u"): 17666 div 3 = 5888
    // (assumes the 3 bigrams land in 3 distinct md5 buckets of 8192 —
    // deterministic, so this either always holds or never does)
    writeDocs(dir, Seq(
      (1L, "w w w", "en"), (2L, "w w", "fr"),
      (3L, "u u", "en"), (4L, "w w u u", "fr")))
    val got = graft.text.TextAnalysis.txtDsirWeights(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "en", 2L, 6000L), (2L, "fr", 1L, 6000L),
      (3L, "en", 1L, 6666L), (4L, "fr", 3L, 5888L)))
  }

  test("txt_bpe_train: freq weighting, run parity, lexicographic ties") {
    import spark.implicits._
    val dir = tmp("bpe")
    // word freqs: aaa×3, ab×1, b×2, cd×1, ce×1
    // r1: (a,a) = 2 positions × freq 3 = 6 — and "aaa" merges LEFT TO
    //     RIGHT: island {1,2}, odd row only → [aa, a], never [a, aa]
    // r2: (aa,a) = 3 → [aaa]
    // r3: (a,b)/(c,d)/(c,e) all 1 → lexicographic: a < c picks (a,b)
    // r4: (c,d) vs (c,e) → d < e
    writeDocs(dir, Seq((1L, "aaa aaa aaa ab b b cd ce", "en")))
    val got = graft.text.TextAnalysis.txtBpeTrain(spark, dir, rounds = 4)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 6L), (2, "aa", "a", "aaa", 3L),
      (3, "a", "b", "ab", 1L), (4, "c", "d", "cd", 1L)))
  }

  test("pipeline_dsir_sample: score-10⁴ docs always keep, score-0 never") {
    import spark.implicits._
    val dir = tmp("dsirsample")
    // doc 1 (en): its bigram is all-target → coef 10⁴ → score 10⁴,
    //   and the hash coin is < 10⁴ by construction → ALWAYS kept
    // doc 2 (fr): one bigram repeated 10000× with zero target mass →
    //   coef = 10⁴ div 10001 = 0 → score 0 → NEVER kept (h < 0)
    writeDocs(dir, Seq(
      (1L, "a a a", "en"), (2L, ("w " * 10000) + "w", "fr")))
    val got = graft.operators.Analytics.pipelineDsirSample(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("en", 1L, 1L, 10000L, 2L, 10000L),
      ("fr", 1L, 0L, 0L, 0L, 0L)))
  }

  test("txt_bpe_apply: encode via the trained vocabulary, integer compression") {
    import spark.implicits._
    val dir = tmp("bpeapply")
    // after the same 4 merges as the trainer fixture the vocabulary
    // encodes as: aaa→1 token, ab→1, b→1, cd→1, ce→2 (c,e unmerged)
    // doc: 8 words, 17 chars, 9 tokens → compression 170000 div 9
    writeDocs(dir, Seq((1L, "aaa aaa aaa ab b b cd ce", "en")))
    val got = graft.text.TextAnalysis.txtBpeApply(spark, dir, rounds = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 8L, 17L, 9L, 18888L)))
  }

  test("sim_mmr_rerank: greedy diversity — a redundant twin is demoted") {
    import spark.implicits._
    val dir = tmp("mmr")
    // query 0 = [1,0]; candidates: 100/101 identical to the query
    // (rel 1, mutual sim 1), 102 orthogonal (rel 0), 103 at 45°
    // (rel = sim = 1/√2). Greedy with λ=0.7:
    //   r1: 100/101 tie at rel 1.0 → doc_id picks 100, score 1.0
    //   r2: 101 → 0.7·1 − 0.3·1 = 0.4 beats 103's 0.4/√2 = 0.2828
    //   r3: 103 → 0.2828 beats 102's 0.0
    //   r4: 102 → 0 − 0.3·sim(102,103) = −0.3/√2 = −0.2121
    // every round exercises a different term: the rel tie (r1), the
    // redundancy penalty ordering (r2 vs r3), and a negative score
    // where the penalty dominates (r4)
    Seq((0L, Seq(1f, 0f), 0), (100L, Seq(1f, 0f), 0),
        (101L, Seq(1f, 0f), 0), (102L, Seq(0f, 1f), 0),
        (103L, Seq(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.similarity.Similarity.simMmrRerank(spark, dir, k = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == Set(
      (0L, 100L, 1, 1.0), (0L, 101L, 2, 0.4),
      (0L, 103L, 3, 0.2828), (0L, 102L, 4, -0.2121)))
  }

  test("corpus invariants: BPE counts non-increasing, MMR bracketed by brute, DSIR favors its target") {
    import spark.implicits._
    val sf = SparkTestSession.Sf
    // BPE: the greedy argmax makes merge counts non-increasing (a
    // merge only removes occurrences of existing pairs, and any NEW
    // pair it creates occurs at most as often as the merged symbol),
    // and every learned merge is distinct
    val merges = graft.text.TextAnalysis.txtBpeTrain(spark, sf)
      .orderBy($"round").select($"merged", $"pair_count")
      .as[(String, Long)].collect()
    assert(merges.length == 8)
    assert(merges.map(_._2).sliding(2).forall(w => w(0) >= w(1)),
      s"merge counts increased: ${merges.mkString(", ")}")
    assert(merges.map(_._1).distinct.length == 8, "duplicate merge learned")
    // MMR: round 1 is pure relevance with the brute tiebreak, so each
    // query's first pick IS its brute top-1; and from round 2 on the
    // greedy maximum can only fall (selection grows, candidates only
    // accumulate penalty)
    val mmr = graft.similarity.Similarity.simMmrRerank(spark, sf)
      .select($"query_id", $"doc_id", $"mmr_rank", $"mmr_score")
      .as[(Long, Long, Int, Double)].collect()
    val brute1 = graft.similarity.Similarity.simBruteTopk(spark, sf)
      .filter($"rank" === 1).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toMap
    mmr.filter(_._3 == 1).foreach { case (q, d, _, _) =>
      assert(brute1(q) == d, s"query $q: MMR first pick != brute top-1")
    }
    mmr.groupBy(_._1).values.foreach { rows =>
      val tail = rows.sortBy(_._3).drop(1).map(_._4)
      assert(tail.sliding(2).filter(_.length == 2)
               .forall(w => w(0) >= w(1)),
        s"MMR scores rose after round 2: ${rows.sortBy(_._3).mkString(", ")}")
    }
    // DSIR: the target slice must outscore the rest on average —
    // that is the operator's entire point
    val byLang = graft.text.TextAnalysis.txtDsirWeights(spark, sf)
      .groupBy($"lang" === "en")
      .agg(avg($"dsir_score_bp").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(byLang(true) > byLang(false),
      s"target slice does not outscore the rest: $byLang")
  }

  test("sim_hybrid_rrf: fusion arithmetic, list-miss zeros, tiebreaks") {
    import spark.implicits._
    val dir = tmp("hybrid")
    // query = doc/vec 0. Corpus 100/101/102 (ids ≥ 10 ⇒ not queries).
    // vectors: 100 ∥ query (rank 1), 102 at 45° (rank 2), 101 ⊥ (rank 3)
    Seq((0L, Seq(1f, 0f), 0), (100L, Seq(1f, 0f), 0),
        (101L, Seq(0f, 1f), 0), (102L, Seq(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // terms: df(alpha)=3, df(beta)=2, N=4 →
    //   idf(alpha) = (2·10⁴) div 4 = 5000, idf(beta) = (3·10⁴) div 3 = 10000
    // lex scores vs query {alpha, beta}: 101 = 15000 (rank 1),
    //   102 = 5000 (rank 2), 100 shares nothing (absent)
    writeDocs(dir, Seq(
      (0L, "alpha beta", "en"), (100L, "gamma delta", "en"),
      (101L, "alpha beta", "en"), (102L, "alpha gamma", "en")))
    val got = graft.similarity.Similarity.simHybridRrf(spark, dir)
      .select($"query_id", $"doc_id", $"rank", $"rrf_e6")
      .as[(Long, Long, Int, Long)].collect().toSet
    // rrf: 101 → 10⁶ div 61 + 10⁶ div 63 = 16393+15873 = 32266
    //      102 → 2 · (10⁶ div 62) = 32258 (fusion near-tie, below 101)
    //      100 → vector-only 16393 (lex miss contributes 0)
    assert(got == Set(
      (0L, 101L, 1, 32266L), (0L, 102L, 2, 32258L), (0L, 100L, 3, 16393L)))
    // the lex-missing row carries a null lex_rank, not a sentinel
    val nulls = graft.similarity.Similarity.simHybridRrf(spark, dir)
      .filter($"doc_id" === 100L)
      .select($"lex_rank".isNull, $"vec_rank").as[(Boolean, Int)].collect()
    assert(nulls.toSeq == Seq((true, 1)))
  }
}
