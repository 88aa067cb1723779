package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sketch-vs-exact checks for the text operators whose algorithms
  * have no SQL oracle.
  */
class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("language ID beats chance against the labeled lang column") {
    import spark.implicits._
    val r = graft.text.TextAnalysis.txtLangId(spark, sf)
      .agg(avg($"correct".cast("double")).as("acc"),
           count(lit(1)).as("n")).head()
    val (acc, n) = (r.getDouble(0), r.getLong(1))
    assert(n > 0)
    // the synthetic corpus draws every language's docs from the SAME
    // tech vocabulary (verified: top-12 words per label overlap almost
    // completely), so the ceiling for any lexical classifier here is
    // low — the bar is "meaningfully above 5-way chance (0.2)", which
    // proves the scoring machinery works, not corpus linguistics
    assert(acc >= 0.3, s"langid accuracy $acc not above chance")
  }

  test("winnowing fingerprints: deterministic, and exact duplicates share them") {
    import spark.implicits._
    val fp = graft.text.TextAnalysis.txtFingerprint(spark, sf)
    assert(fp.count() == graft.core.Tables.documents(spark, sf).count())
    // identical text (the exact-dup clusters) → identical digests
    // cluster on the raw text: fingerprints are case-sensitive
    val withHash = graft.core.Tables.documents(spark, sf)
      .withColumn("h", md5($"text"))
      .select($"doc_id", $"h")
    val perCluster = fp.join(withHash, Seq("doc_id"))
      .groupBy($"h")
      .agg(countDistinct($"min_fp", $"max_fp", $"n_fingerprints").as("variants"))
    assert(perCluster.filter($"variants" =!= 1).count() == 0)
    // determinism across two evaluations
    val again = graft.text.TextAnalysis.txtFingerprint(spark, sf)
    assert(fp.exceptAll(again).count() == 0)
  }

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

  test("PII scrub: counts match injections, redacted text carries no live PII") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val scrubbed = TextAnalysis.txtPiiScrub(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf)
    assert(scrubbed.count() == docs.count(), "one row per document")
    // counts are exactly the injection rule: one email iff doc_id%3=0,
    // one phone iff %5=0, one id iff %7=0 (the corpus itself is clean)
    val wrong = scrubbed.filter(
      $"n_emails" =!= when($"doc_id" % 3 === 0, 1L).otherwise(0L) ||
      $"n_phones" =!= when($"doc_id" % 5 === 0, 1L).otherwise(0L) ||
      $"n_ids"    =!= when($"doc_id" % 7 === 0, 1L).otherwise(0L)).count()
    assert(wrong == 0, "scrub counts disagree with the injection rule")
    // nothing PII-shaped survives in the redacted text, and every
    // injected doc carries its marker
    assert(scrubbed.filter(
      col("clean_text").rlike(TextAnalysis.EmailRe) ||
      col("clean_text").rlike(TextAnalysis.PhoneRe) ||
      col("clean_text").rlike(TextAnalysis.IdRe)).count() == 0,
      "live PII left in clean_text")
    assert(scrubbed.filter($"doc_id" % 3 === 0 &&
      !col("clean_text").contains("<EMAIL>")).count() == 0)
    assert(scrubbed.filter($"doc_id" % 5 === 0 &&
      !col("clean_text").contains("<PHONE>")).count() == 0)
    assert(scrubbed.filter($"doc_id" % 7 === 0 &&
      !col("clean_text").contains("<ID>")).count() == 0)
    // piiScrub is a library transform over any text column: idempotent
    // on already-scrubbed text
    val twice = TextAnalysis.piiScrub(
      scrubbed.select($"doc_id", $"clean_text".as("text")))
    assert(twice.filter($"n_emails" + $"n_phones" + $"n_ids" =!= 0)
      .count() == 0, "scrub is not idempotent")
  }

  test("char entropy: zero-shuffle projection, scalar replay, ln(27) bound") {
    import spark.implicits._
    val ent = graft.text.TextAnalysis.txtEntropy(spark, sf)
    // the gate is a pure projection — any Exchange is a regression
    val p = ent.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"entropy gate shuffles\n$p")
    val rows = ent.select($"doc_id", $"n_modeled", $"entropy_e4")
      .as[(Long, Long, Long)].collect()
    assert(rows.length ==
      graft.core.Tables.documents(spark, sf).count().toInt)
    // H ≤ ln(27) nats (uniform over the 27 modeled classes); rounding
    // adds at most 1e-4 per class term
    assert(rows.forall { case (_, n, e) => n > 0 && e >= 0 && e <= 32959 })
    // replay the integer formula in plain Scala on the raw text
    val texts = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val alphabet = ('a' to 'z') :+ ' '
    rows.take(25).foreach { case (id, n, e) =>
      val t = texts(id).trim
      val cnts = alphabet.map(c => t.count(_ == c).toLong).filter(_ > 0)
      val nS = cnts.sum
      val eS = cnts.map(x =>
        x * math.round(10000 * math.log(nS.toDouble / x))).sum / nS
      assert(n == nS && e == eS, s"doc $id: ($n,$e) vs scalar ($nS,$eS)")
    }
  }

  test("surprisal: integer accounting is internally consistent") {
    import spark.implicits._
    val s = graft.text.TextAnalysis.txtSurprisal(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf)
    // one row per document
    assert(s.count() == docs.count())
    // Σ n_tokens == the corpus token count, recomputed independently
    val totalTokens = docs
      .select(explode(expr("split(trim(text), ' +')"))).count()
    assert(s.agg(sum($"n_tokens")).head().getLong(0) == totalTokens)
    // the mean really is the integer quotient, and scores are
    // non-negative (every term's cnt ≤ T so ln(T/cnt) ≥ 0)
    assert(s.filter($"mean_surprisal_e4" =!=
      expr("surprisal_e4 div n_tokens")).count() == 0)
    assert(s.filter($"surprisal_e4" < 0).count() == 0)
    // a document made ONLY of the corpus's most common term must
    // score the minimum possible mean: every doc's mean ≥ the most
    // common term's own surprisal
    val minTerm = docs
      .select(explode(expr("split(trim(text), ' +')")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .agg(max($"cnt")).head().getLong(0)
    val total = totalTokens.toDouble
    val floorE4 = math.round(10000 * math.log(total / minTerm))
    assert(s.filter($"mean_surprisal_e4" < floorE4).count() == 0,
      "a document scored below the most-common-term floor")
  }

  test("dup coverage: exact-dup clusters fully covered, accounting consistent") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cov = graft.text.TextAnalysis.txtDupCoverage(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf)
    // one row per document, bounded accounting
    assert(cov.count() == docs.count())
    assert(cov.filter($"dup_shingles" > $"n_shingles" ||
      $"dup_bp" < 0 || $"dup_bp" > 10000 ||
      $"dup_bp" =!= expr("(10000 * dup_shingles) div n_shingles"))
      .count() == 0)
    // a doc whose exact text appears in ANOTHER doc shares every
    // shingle with it → coverage must be exactly 10000 bp
    val clustered = docs.withColumn("h", md5(trim($"text")))
      .withColumn("csize", count(lit(1)).over(Window.partitionBy($"h")))
      .filter($"csize" >= 2).select($"doc_id")
    assert(clustered.join(cov, Seq("doc_id"))
      .filter($"dup_bp" =!= 10000).count() == 0,
      "an exact-dup doc scored below full coverage")
    // the signal discriminates on this near-dup-rich corpus: some
    // cross-doc shingle sharing exists, but not every doc is fully
    // covered (sf0.001 has near-dup pairs though no exact-dup texts)
    assert(cov.agg(sum($"dup_shingles")).head().getLong(0) > 0,
      "no cross-document shingle sharing found at all")
    assert(cov.filter($"dup_bp" < 10000).count() > 0)
  }

  test("hashed classifier: exact token accounting, bounded logits, threshold gate") {
    import spark.implicits._
    val cl = graft.text.TextAnalysis.txtClassifier(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf)
    assert(cl.count() == docs.count())
    // per-token weights live in [-1000, 1000] → logit bounded by
    // ±1000·n_tokens; gate and mean are definitional
    assert(cl.filter(abs($"logit") > $"n_tokens" * 1000 ||
      (($"keep" === 1) =!= ($"logit" >= 0)) ||
      $"logit_e4_per_token" =!= expr("(10000 * logit) div n_tokens"))
      .count() == 0)
    // token accounting matches the tokenizer exactly
    val toks = docs.select($"doc_id",
      expr("cast(size(split(trim(text), ' +')) as bigint)").as("n"))
    assert(cl.join(toks, Seq("doc_id"))
      .filter($"n_tokens" =!= $"n").count() == 0)
    // the 256-bucket hash discriminates documents
    assert(cl.select($"logit_e4_per_token").distinct().count() > 1)
  }

  test("BPE pair counts: scalar replay with within-word multiplicity") {
    import spark.implicits._
    // "aaab aaab ba" → wc: aaab×2, ba×1
    //   aaab: aa×2, aa... pairs per occurrence: aa,aa,ab → ×2 words
    //   ba: ba×1  ⇒ aa→4, ab→2, ba→1
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Seq((1L, "aaab aaab ba", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.text.TextAnalysis.txtBpePairs(spark, dir)
      .select($"pair", $"n", $"rank").as[(String, Long, Int)]
      .collect().toSet
    assert(got == Set(("aa", 4L, 1), ("ab", 2L, 2), ("ba", 1L, 3)))
  }

  test("bigram LM surprisal: scalar replay on a 2-doc corpus") {
    import spark.implicits._
    // corpus: "a b a c" + "b a b"
    //   cnt2: "a b"→2, "b a"→2, "a c"→1;  cnt1: a→3, b→2
    //   e4(−ln P): "a b" ln(3/2)→4055, "b a" ln(2/2)→0, "a c" ln(3)→10986
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    Seq((1L, "a b a c", "en", "src0"), (2L, "b a b", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.text.TextAnalysis.txtBigramLm(spark, dir)
      .select($"doc_id", $"n_bigrams", $"surprisal_e4",
              $"mean_surprisal_e4")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 4055L + 0L + 10986L, (4055L + 10986L) / 3),
      (2L, 2L, 4055L, 4055L / 2)))
  }

  test("gopher rule gate: one doc per rule at its exact boundary") {
    import spark.implicits._
    def w(n: Int) = (1 to n).map(i => f"w$i%02d")         // 3-char alpha
    def digits(n: Int) = (1 to n).map(i => f"$i%03d")     // 3-char numeric
    val docs = Seq(
      // pass-all, mean word length EXACTLY 3n (boundary pass)
      (w(48) ++ Seq("the", "and")),
      // 49 words → fails R1 (wordcount) only
      (w(47) ++ Seq("the", "and")),
      // one word ×11 of 50 → 5·11 > 50 → fails R6 (repetition) only
      (Seq.fill(11)("xxx") ++ w(37) ++ Seq("the", "and")),
      // one word ×10 of 50 → 5·10 = 50, NOT > → passes (boundary)
      (Seq.fill(10)("xxx") ++ w(38) ++ Seq("the", "and")),
      // 1 distinct stopword → fails R4 only
      (Seq("the") ++ w(49)),
      // 14 distinct over 50 tokens → 10·14 < 3·50 → fails R5 (TTR) only
      (Seq("aaa", "bbb", "ccc", "ddd").flatMap(x => Seq.fill(10)(x)) ++
        w(8) ++ Seq("the", "and")),
      // 48 11-char words → chars 534 > 10·50 → fails R2 (meanlen) only
      ((1 to 48).map(i => f"verylong$i%03d") ++ Seq("the", "and")),
      // 11/50 words letterless → 5·39 < 4·50 → fails R3 (alpha) only
      (digits(11) ++ w(37) ++ Seq("the", "and")),
      // 10/50 letterless → 5·40 = 4·50, NOT < → passes (boundary)
      (digits(10) ++ w(38) ++ Seq("the", "and")))
      .zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
    val got = graft.text.TextAnalysis.gopherRules(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set(("s", 9L, 1L, 1L, 1L, 1L, 1L, 1L, 3L)))
  }

  test("ccnet buckets: terciles tile each language's surprisal range") {
    import spark.implicits._
    val b = graft.text.TextAnalysis.txtCcnetBuckets(spark, sf)
      .select($"lang", $"bucket", $"n_docs", $"min_mean_e4", $"max_mean_e4")
      .as[(String, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> (r._3, r._4, r._5)).toMap)
    val lmCounts = graft.text.TextAnalysis.txtBigramLm(spark, sf)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    for ((lang, bk) <- b) {
      val n = lmCounts(lang)
      assert(bk.values.map(_._1).sum == n, s"$lang buckets don't cover the LM docs")
      // threshold at rank ceil(n/3): head holds at least a third,
      // tail at most a third (ties can only grow head / shrink tail)
      assert(3 * bk("head")._1 >= n, s"$lang head too small")
      assert(3 * bk.get("tail").map(_._1).getOrElse(0L) <= n, s"$lang tail too big")
      // value ranges are ordered and non-overlapping
      for (p <- Seq("head" -> "middle", "middle" -> "tail")
           if bk.contains(p._1) && bk.contains(p._2))
        assert(bk(p._1)._3 < bk(p._2)._2,
          s"$lang ${p._1}/${p._2} ranges overlap")
    }
    assert(b.nonEmpty)
  }

  test("heaps law: deciles cover the corpus, cumulative vocab is the global distinct count") {
    import spark.implicits._
    val h = graft.text.TextAnalysis.txtHeapsLaw(spark, sf)
      .orderBy($"bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    val docs = graft.core.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val vocab = docs.selectExpr("explode(split(trim(text), ' +')) AS w")
      .select("w").distinct().count()
    assert(h.map(_._2).sum == nDocs, "deciles don't partition the docs")
    assert(h.last._5 == vocab, "cumulative types != global distinct words")
    assert(h.map(_._4).sum == vocab)
    // cum_types is the running sum of new_types
    assert(h.scanLeft(0L)(_ + _._4).tail.sameElements(h.map(_._5)))
    // a growing corpus keeps discovering SOME new vocabulary, but
    // sub-linearly: later deciles contribute fewer new types than
    // the first (Heaps sub-linearity on any natural-ish corpus)
    assert(h.head._4 > h.last._4)
  }
}
