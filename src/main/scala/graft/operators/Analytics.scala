package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Statistical / reshaping analytics beyond the TPC-H core: moment
  * statistics, GROUPING SETS, unpivot (wide→long), date-dimension
  * rollups, duplicate-cluster profiles, value histograms, bigram
  * term statistics.
  *
  * Scale notes (100 TB): every operator is one narrow pass over the
  * scan followed by a single partial-then-final aggregation shuffle
  * on the group keys. Moment statistics (corr/covar/stddev) use
  * Spark's one-pass co-moment aggregates — no second scan, no
  * driver-side math. Unpivot is a per-row expression (no shuffle
  * until the aggregate). Histograms bucket before counting, so
  * cardinality after the shuffle is bounded by the bucket count,
  * not the row count.
  */
object Analytics {

  /** Per-group moment statistics: Pearson correlation, sample
    * stddev/covariance of quantity vs. price. One-pass co-moment
    * aggregation (map-side partial), one shuffle on the group key.
    */
  def qStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("qty_price_corr"),
        round(stddev_samp($"l_quantity"), 4).as("qty_stddev"),
        round(covar_samp($"l_quantity", $"l_extendedprice"), 2).as("qty_price_covar"),
        round(avg($"l_quantity"), 4).as("qty_avg"),
        count(lit(1)).as("n_rows"))
  }

  /** GROUPING SETS: three independent grouping levels computed in a
    * single expand+aggregate pass (Spark's Expand operator — one
    * shuffle, not one scan per set).
    */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq.empty),
        $"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
           count(lit(1)).as("n_rows"))
  }

  /** Unpivot (wide→long): the four lineitem measures melt into
    * (measure, value) rows — a per-row Expand, zero shuffle — then
    * aggregate per measure.
    */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .unpivot(
        ids = Array($"l_returnflag"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        variableColumnName = "measure",
        valueColumnName = "value")
      .groupBy($"measure")
      // whole-fact totals (~3.2e12 at sf10) accumulate in DECIMAL —
      // the double sum flips cents with partition merge order (caught
      // by the r14 sf10 gate widening, the q_cube class; all four
      // measures are exact 2-decimal values so the cast is lossless).
      // The mean derives from the exact decimal total by ONE double
      // division + round, identical on both engines — never a rounded
      // float avg (the verify-notes rule).
      .agg(count(lit(1)).as("n_values"),
           sum($"value".cast("decimal(18,2)")).as("tot_dec"))
      .select($"measure", $"n_values",
        $"tot_dec".cast("double").as("total"),
        round($"tot_dec".cast("double") / $"n_values", 4).as("mean"))
  }

  /** Date-dimension rollup: calendar functions (year/quarter/month)
    * derived per-row in the scan projection, then one aggregation
    * shuffle. At 100 TB the input would be partitioned by date and
    * this prunes to the requested range before the scan.
    */
  def qDateDim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select(year($"o_orderdate").as("o_year"),
              quarter($"o_orderdate").as("o_quarter"),
              month($"o_orderdate").as("o_month"),
              $"o_totalprice")
      .groupBy($"o_year", $"o_quarter", $"o_month")
      .agg(count(lit(1)).as("n_orders"),
           round(sum($"o_totalprice"), 2).as("revenue"))
  }

  /** Histogram of event values: fixed-width bucketing per event type.
    * Bucket id is computed per-row, so post-shuffle cardinality is
    * #types × #buckets regardless of input size.
    */
  def evtValueBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("bucket", floor($"value" / 10.0).cast("long"))
      .groupBy($"event_type", $"bucket")
      // sum, not avg: a 4-decimal-rounded avg can land on a .00005
      // boundary and flip on cross-engine last-ulp differences
      // (seen at sf0.1); sums of 2-decimal values round stably
      .agg(count(lit(1)).as("n_events"),
           round(sum($"value"), 2).as("total_value"))
  }

  /** Duplicate-cluster profile: distribution of exact-duplicate
    * cluster sizes (from [[graft.dedup.Dedup.dedupExact]]). The
    * second aggregation runs over one row per cluster — already tiny.
    */
  def dedupClusterStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.dedup.Dedup.dedupExact(spark, sfDir)
      .groupBy($"n_docs".as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs_total", $"cluster_size" * $"n_clusters")
  }

  /** Gap-filled monthly time series: a month spine (derived from the
    * data's own span — one-row aggregate, so the spine build is
    * metadata-cheap) cross-joined with the status dimension, left
    * join against the actual monthly aggregate, zeros filled. The
    * dense-calendar reporting shape: output cardinality is
    * #months × #statuses however large the input.
    */
  def qGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val months = o
      .agg(date_trunc("month", min($"o_orderdate")).as("lo"),
           date_trunc("month", max($"o_orderdate")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("month_start"))
    val statuses = o.select($"o_orderstatus").distinct()
    val actual = o
      .groupBy(date_trunc("month", $"o_orderdate").as("m"),
               $"o_orderstatus".as("s"))
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("rev"))
    months.crossJoin(statuses)
      .join(actual, $"month_start" === $"m" && $"o_orderstatus" === $"s", "left")
      .select($"month_start", $"o_orderstatus",
              coalesce($"n", lit(0L)).as("n_orders"),
              coalesce($"rev", lit(0.0)).as("revenue"))
  }

  /** Several COUNT(DISTINCT) over different columns in one aggregate —
    * Spark plans this with Expand (one row per distinct-column) so it
    * stays a single scan + one shuffle, not one job per distinct.
    */
  def qMultiDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_customers"),
           countDistinct($"o_orderpriority").as("n_priorities"),
           count(lit(1)).as("n_orders"))
  }

  /** Scalar string-function surface (upper/substring/replace/lpad/
    * concat/length/reverse) — all codegen'd projection work fused
    * into the scan, zero shuffles before the final small aggregate.
    */
  def qStringFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .select(
        $"c_custkey",
        upper($"c_name").as("name_upper"),
        substring($"c_name", 1, 8).as("name_prefix"),
        regexp_replace($"c_name", "#", "-").as("name_dashed"),
        lpad($"c_custkey".cast("string"), 8, "0").as("key_padded"),
        concat($"c_mktsegment", lit("/"), $"c_name").as("seg_name"),
        length($"c_name").cast("int").as("name_len"),
        reverse($"c_name").as("name_rev"))
  }

  /** Range join: orders priced into a small tier table via a
    * BETWEEN predicate. The tier side is tiny and broadcast, so the
    * plan is a broadcast nested-loop whose inner side is ~5 rows —
    * linear in the fact table at any scale. (A large×large range
    * join would instead bin both sides to an equi-key first; the
    * bin trick is what [[evtValueBuckets]] demonstrates.)
    */
  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      ("T1_budget",    0.0,      100000.0),
      ("T2_mid",       100000.0, 200000.0),
      ("T3_high",      200000.0, 300000.0),
      ("T4_premium",   300000.0, 400000.0),
      ("T5_top",       400000.0, 1e18)
    ).toDF("tier", "lo", "hi")
    Tables.orders(spark, sfDir)
      .join(broadcast(tiers),
            $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_orders"),
           // 5 tiers over the whole fact — DECIMAL accumulation for
           // the same reason as q_cube's grand total (cent flips at
           // sf10 magnitude under double merge order)
           sum($"o_totalprice".cast("decimal(18,2)"))
             .cast("double").as("revenue"))
  }

  /** End-to-end training-data prep pipeline, composed as ONE
    * declarative plan: exact dedup (keep lowest doc_id per content
    * hash) → quality gate (≥ 20 tokens) → language filter (en) →
    * per-source corpus stats. Catalyst fuses the per-row stages into
    * the scan projection; the only shuffles are the dedup hash
    * partition and the final small aggregate. This is the shape a
    * 100 TB curation run takes: no materialization between stages.
    */
  def pipelinePrep(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"content_hash").orderBy($"doc_id")
    Tables.documents(spark, sfDir)
      .withColumn("content_hash", md5(lower(trim($"text"))))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .withColumn("n_tokens", size(expr("split(trim(text), ' +')")))
      .filter($"n_tokens" >= 20 && $"lang" === "en")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").as("total_tokens"),
           round(avg($"n_chars"), 2).as("avg_chars"))
  }

  /** Sequence packing for training batches: the corpus concatenates
    * (in deterministic doc_id order within each (source, shard)
    * stream) and cuts every 512 tokens — each document is assigned to
    * the packed context its FIRST token lands in, the standard
    * concatenate-and-split packing an LLM data loader performs.
    * The shard key (doc_id div 1000) keeps the running-sum window's
    * partition count proportional to corpus size — packing streams
    * are arbitrary, so a composite key costs nothing and a
    * source-only window (a handful of giant partitions) would be the
    * low-cardinality sort this engine bans. Output: docs and tokens
    * per packed context.
    */
  def pipelinePack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source", $"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
              expr("cast(size(split(trim(text), ' +')) as bigint)").as("n_tokens"))
      .withColumn("shard", expr("doc_id div 1000"))
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("context_id", expr("cum_before div 512"))
      .groupBy($"source", $"shard", $"context_id")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").as("n_tokens"))
  }

  /** Per-source token-budget quota (the domain-cap stage of every
    * large corpus recipe — C4/Dolma-style over-represented-domain
    * throttling): documents are admitted in deterministic 63-bit
    * md5(doc_id) hash order (an unbiased sample order, reproducible
    * across engines/runs/partitionings) until the source's token
    * budget is exhausted; the straddling document is rejected.
    *
    * Scale notes (100 TB): the naive form is ONE running-sum window
    * per source — a handful of giant sorted partitions, the
    * low-cardinality global sort this engine bans. This is instead
    * the classic TWO-LEVEL parallel prefix scan: (1) hash-contiguous
    * buckets (top bits of the hash, so bucket ranges ARE the order)
    * get bucket-local running sums at parallelism ∝ buckets;
    * (2) per-(source, bucket) totals — a bucket-count-sized relation
    * — get the bucket-offset running sum in a tiny window;
    * (3) offsets broadcast-join back. Output is bucket-invariant:
    * offset + local cumsum ≡ the global per-source cumsum, which is
    * exactly what the single-window DuckDB oracle computes.
    */
  def pipelineCap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cap = spark.conf.get("spark.graft.sourceTokenCap", "800").toLong
    val d = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        expr("cast(size(split(trim(text), ' +')) as bigint)").as("n_tokens"))
      .withColumn("h", expr(
        "graft_md5lower64(cast(doc_id as string)) & 9223372036854775807"))
      // 2^51 divisor → 4096 hash-contiguous buckets (production would
      // size this ∝ corpus; the OUTPUT is bucket-count-invariant)
      .withColumn("bucket", expr("h div 2251799813685248L"))
    val wLocal = Window.partitionBy($"source", $"bucket")
      .orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = d.withColumn("cum_local",
      coalesce(sum($"n_tokens").over(wLocal), lit(0L)))
    val wOffs = Window.partitionBy($"source").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy($"source", $"bucket")
      .agg(sum($"n_tokens").as("btok"))
      .withColumn("offset", coalesce(sum($"btok").over(wOffs), lit(0L)))
      .select($"source", $"bucket", $"offset")
    local.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_before", $"offset" + $"cum_local")
      .withColumn("admitted", $"cum_before" + $"n_tokens" <= cap)
      .select($"doc_id", $"source", $"n_tokens", $"cum_before", $"admitted")
  }

  /** Per-language top-10 bigram counts: adjacent word pairs via
    * slice+zip (no sequence() — its descending-on-empty behavior is
    * a footgun), explode, count, bounded-heap top-k (the bigram
    * vocabulary is far larger than the word vocabulary, so a
    * per-language window sort is the first thing to fall over at
    * corpus scale). Same shape as
    * [[graft.text.TextAnalysis.txtTermFreq]].
    */
  def txtBigrams(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("bigram", explode(expr(
        "zip_with(slice(words, 1, size(words)-1), slice(words, 2, size(words)-1), (a, b) -> concat(a, ' ', b))")))
      .groupBy($"lang", $"bigram")
      .agg(count(lit(1)).as("n"))
      .groupBy($"lang")
      .agg(graft.functions.TopK.topKStr(10)($"bigram", $"n".cast("double")).as("top"))
      .select($"lang", posexplode($"top").as(Seq("i", "p")))
      .select($"lang", $"p._1".as("bigram"), $"p._2".cast("long").as("n"),
              ($"i" + 1).cast("int").as("rank"))
  }

  /** Scalar array-function surface (the collection analog of
    * `q_string_funcs`): slice / sort / distinct / contains / position
    * / element access over each document's word array, one narrow
    * codegen pass, no shuffle.
    */
  def qArrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .select(
        $"doc_id",
        expr("cast(size(words) as int)").as("n_words"),
        expr("cast(size(array_distinct(words)) as int)").as("n_distinct"),
        expr("concat_ws('|', slice(words, 1, 3))").as("first3"),
        expr("array_min(words)").as("min_word"),
        expr("array_max(words)").as("max_word"),
        expr("array_contains(words, 'the')").as("has_the"),
        expr("cast(array_position(words, 'data') as int)").as("pos_data"),
        expr("element_at(words, -1)").as("last_word"))
  }

  /** End-to-end curation: the full training-data pass — exact dedup,
    * length and repetition quality gates, deterministic mixture
    * sampling, and 512-token sequence packing — as ONE declarative
    * plan. Each stage is an operator proven separately
    * ([[graft.dedup.Dedup.dedupExact]], `txt_repetition`,
    * [[pipelineSample]], [[pipelinePack]]); composing them costs two
    * key-partitioned windows (content hash; (source, shard) running
    * sum) plus the final rollup — every other gate rides the scan
    * pass. Output: per source, the funnel (candidates → kept), kept
    * token mass, and how many packed training contexts result.
    */
  def pipelineCurate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rates = spark.createDataFrame(Seq(
      ("src0", 10000L), ("src1", 5000L), ("src2", 2500L),
      ("src3", 1250L), ("src4", 625L))).toDF("r_source", "keep_bp")
    val hashW = Window.partitionBy($"content_hash").orderBy($"doc_id")
    val packW = Window.partitionBy($"source", $"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val gated = Tables.documents(spark, sfDir)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("n_tokens", expr("cast(size(words) as bigint)"))
      // 63-bit shingle hashes, not strings (same fusion as
      // txt_repetition — the transform/slice/concat_ws lambda paid
      // interpreted dispatch per trigram; distinct-of-hashes ==
      // distinct-of-strings up to 2⁻⁶³)
      .withColumn("tri", expr(
        "if(size(words) >= 3, graft_shingle_md5(words, 3), " +
          "cast(array() as array<bigint>))"))
      .withColumn("dup_tri",
        (expr("cast(size(tri) as bigint)") -
          expr("cast(size(array_distinct(tri)) as bigint)")).cast("double") /
          greatest(expr("cast(size(tri) as bigint)"), lit(1L)).cast("double"))
      .withColumn("content_hash", md5(lower(trim($"text"))))
      .withColumn("h", Tables.docBasisPoints)
      .join(broadcast(rates), $"source" === $"r_source", "left_outer")
      .withColumn("kb", coalesce($"keep_bp", lit(500L)))
      .withColumn("rn", row_number().over(hashW))
      .withColumn("kept",
        $"rn" === 1 && $"n_tokens" >= 20 && $"dup_tri" <= 0.2 && $"h" < $"kb")
    val packed = gated.filter($"kept")
      .withColumn("shard", expr("doc_id div 1000"))
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(packW), lit(0L)))
      .withColumn("context_id", expr("cum_before div 512"))
    val funnel = gated.groupBy($"source")
      .agg(count(lit(1)).as("n_candidates"),
           count(when($"kept", 1)).as("n_kept"))
    val contexts = packed.groupBy($"source")
      .agg(sum($"n_tokens").as("kept_tokens"),
           countDistinct($"shard", $"context_id").as("n_contexts"))
    funnel.join(contexts, Seq("source"), "left_outer")
      .select($"source", $"n_candidates", $"n_kept",
              coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
              coalesce($"n_contexts", lit(0L)).as("n_contexts"))
  }

  /** Deterministic domain-mixture sampling: each source keeps a
    * configured fraction of its documents, selected by a 63-bit md5
    * hash of the doc id against a basis-point threshold — the
    * training-mixture downsampling pass (e.g. "keep 6% of crawl,
    * 100% of curated"). Hash-based selection beats `sample()` at
    * 100 TB because it is REPRODUCIBLE across runs, engines, and
    * partitionings (no RNG state per partition), stable under
    * re-partitioning, and joins/filters push it into the scan. The
    * rate table is a broadcast literal; the only shuffle is the final
    * per-source rollup.
    */
  def pipelineSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rates = spark.createDataFrame(Seq(
      ("src0", 10000L), ("src1", 5000L), ("src2", 2500L),
      ("src3", 1250L), ("src4", 625L))).toDF("r_source", "keep_bp")
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", expr("cast(size(split(trim(text), ' +')) as bigint)"))
      .withColumn("h", Tables.docBasisPoints)
      .join(broadcast(rates), $"source" === $"r_source", "left_outer")
      .withColumn("kb", coalesce($"keep_bp", lit(500L)))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_total"),
           count(when($"h" < $"kb", 1)).as("n_sampled"),
           coalesce(sum(when($"h" < $"kb", $"n_tokens")), lit(0L)).cast("long")
             .as("sampled_tokens"))
  }

  /** DSIR importance RESAMPLING (the selection step of Xie et al.
    * 2023, consuming [[graft.text.TextAnalysis.txtDsirWeights]]):
    * keep each document with probability proportional to its
    * importance score, decided by the engine's deterministic hash
    * coin — `md5(doc_id) basis points < dsir_score_bp` — so the
    * selected subset is reproducible across runs, engines, and
    * partitionings (the [[pipelineSample]] convention applied to a
    * LEARNED per-document rate instead of per-source constants).
    * Output: per-language selection report — doc counts, kept share,
    * kept bigram mass, and the mean kept score (integer div).
    *
    * Scale (100 TB): the score relation's cost dominates (see
    * txtDsirWeights — linear, pinned); the gate adds one hash
    * comparison per doc and a |langs|-row aggregate.
    */
  def pipelineDsirSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.text.TextAnalysis.txtDsirWeights(spark, sfDir)
      .withColumn("keep", Tables.docBasisPoints < $"dsir_score_bp")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
           count(when($"keep", 1)).as("n_kept"),
           coalesce(sum(when($"keep", $"n_bigrams")), lit(0L)).cast("long")
             .as("kept_bigrams"),
           coalesce(sum(when($"keep", $"dsir_score_bp")), lit(0L))
             .cast("long").as("kept_score_sum"))
      .select($"lang", $"n_docs", $"n_kept",
        expr("(n_kept * 10000) div n_docs").as("kept_bp"),
        $"kept_bigrams",
        expr("case when n_kept > 0 then kept_score_sum div n_kept " +
             "else 0 end").as("mean_kept_score_bp"))
  }

  /** Deterministic train/val/test split (90/5/5) keyed on
    * md5(doc_id) basis points — the hash, not an RNG, decides
    * membership, so the split is reproducible across runs, engines,
    * and partitionings, and a re-run after appending new documents
    * never reassigns an existing doc (the leakage-safety property an
    * eval split must have). One narrow pass + one aggregation shuffle
    * over (source, split).
    */
  def pipelineSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", expr("cast(size(split(trim(text), ' +')) as bigint)"))
      .withColumn("h", Tables.docBasisPoints)
      .withColumn("split", Tables.splitOf($"h"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").cast("long").as("n_tokens"))
  }

  /** k-anonymity gate over quasi-identifiers — the re-identification
    * governance pass a training-data release runs (Sweeney's k-
    * anonymity, k = 10): group documents by the quasi-identifier
    * tuple (source, lang, token-length bucket) and flag every group
    * smaller than k for suppression — a member of such a group is
    * re-identifiable from its metadata alone, so releases either
    * drop those rows or generalize the identifier. Output is one row
    * per group (group size, flag) plus the per-group suppressed mass;
    * the release list is a semi-join against the flagged groups.
    *
    * Scale: ONE map-side-combinable groupBy on the identifier tuple —
    * group cardinality is |sources|×|langs|×|buckets| (metadata-
    * sized), so the aggregate collapses in the map stage and the
    * shuffle is tiny regardless of corpus size. Exact integers only.
    */
  def pipelineKanon(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("len_bucket",
        expr("cast(size(split(trim(text), ' +')) as bigint) div 64"))
      .groupBy($"source", $"lang", $"len_bucket")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("suppress", ($"n_docs" < 10).cast("int"))
      .withColumn("suppressed_docs",
        when($"suppress" === 1, $"n_docs").otherwise(lit(0L)))
  }

  /** Balanced output sharding: md5-assign every document to one of 16
    * shards (salted differently from the split/sample hashes so the
    * three decisions are independent) and profile each shard's doc
    * and token load. At 100 TB this hash IS the repartition key for
    * the final write — uniform by construction, no coordinator, and
    * adding shards only moves ~1/n of keys. The profile's max/min
    * spread is the skew check a writer would alert on.
    */
  def pipelineShard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", expr("cast(size(split(trim(text), ' +')) as bigint)"))
      .withColumn("shard", expr(
        "(graft_md5lower64(concat('shard:', cast(doc_id as string))) " +
          "& 9223372036854775807) % 16"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").cast("long").as("n_tokens"),
           min($"doc_id").as("min_doc_id"),
           max($"doc_id").as("max_doc_id"))
  }

  /** Fixed-SIZE deterministic per-stratum sample — the eval-set /
    * human-review draw (`pipeline_sample` is its RATE-based sibling):
    * exactly the k=50 documents per source with the smallest 52-bit
    * salted hash of their id. Hash-order selection keeps the draw
    * reproducible across engines/runs/partitionings AND append-stable
    * in expectation; 52 bits so the negated score is exactly
    * representable in the aggregate's double (no precision ties),
    * with residual ties broken by ascending doc id — fully
    * deterministic, so the oracle replays the exact member set.
    *
    * Scale notes (100 TB): per-source top-k runs through the
    * bounded-heap [[graft.functions.TopK]] aggregate — every map
    * partition reduces to ≤ k candidates before the shuffle, so the
    * exchange carries ≤ partitions·k rows and NOTHING is ever
    * globally sorted (the row_number-per-stratum formulation would
    * shuffle and sort the whole corpus).
    */
  def pipelineFixedSample(spark: SparkSession, sfDir: String): DataFrame =
    pipelineFixedSample(spark, sfDir, k = 50)

  def pipelineFixedSample(spark: SparkSession, sfDir: String,
                          k: Int): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("h52", expr(
        "graft_md5lower64(concat('fsample:', cast(doc_id as string))) " +
          "& 4503599627370495"))
      .groupBy($"source")
      .agg(graft.functions.TopK.topK(k)(
        $"doc_id", -$"h52".cast("double")).as("top"))
      .select($"source", posexplode($"top").as(Seq("i", "p")))
      .select($"source", $"p._1".as("doc_id"),
              ($"i" + 1).cast("int").as("sample_rank"))
  }

  /** Deterministic per-epoch training-order shuffle: every document
    * gets, for each of 3 training epochs, a 63-bit md5 order key
    * seeded by the epoch — the "shuffle the data differently every
    * epoch" requirement of training-data delivery, WITHOUT a global
    * sort: ordering by a uniform hash key IS the shuffle, and the
    * writer realizes it with `repartitionByRange(order_key)` +
    * `sortWithinPartitions` (range boundaries from a sampled sketch —
    * the TeraSort shape), never a single-reducer total order. The
    * companion `shard` column (top 6 key bits ≈ range-partition id)
    * makes the epoch's delivery order reproducible file-by-file.
    *
    * Reproducibility is the point: hash keys mean any engine, any
    * partitioning, any restart derives the SAME epoch order (no RNG
    * state), and epochs decorrelate because the seed enters the md5
    * preimage. A pure zero-shuffle projection (×3 epoch fan-out).
    */
  def pipelineShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        explode(expr("sequence(0, 2)")).as("epoch"))
      .withColumn("order_key", expr(
        "graft_md5lower64(concat('epoch-', cast(epoch as string), ':', " +
          "cast(doc_id as string))) & 9223372036854775807"))
      .withColumn("shard", expr("order_key div 144115188075855872").cast("int"))
      .select($"doc_id", $"source", $"epoch".cast("int").as("epoch"),
              $"order_key", $"shard")
  }

  /** Deterministic length-curriculum ordering — the easy-to-hard
    * schedule (Bengio et al. '09 shape) a training-data delivery
    * layer materializes: documents bucket into 3 phases by token
    * count (short → medium → long; fixed thresholds 64/192 so the
    * assignment is reproducible and append-stable, never a computed
    * quantile that shifts as the corpus grows), and within a phase
    * the delivery order is a salted md5 key (the [[pipelineShuffle]]
    * recipe — decorrelated from ids, identical on every engine/run).
    * The writer realizes the schedule with
    * `repartitionByRange(phase, order_key)` + sortWithinPartitions —
    * the TeraSort shape, never a single-reducer global sort. Output =
    * the assignment relation (doc → phase, order key) — a pure
    * zero-shuffle projection.
    */
  def pipelineCurriculum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", expr("cast(size(split(trim(text), ' +')) as bigint)"))
      .withColumn("phase",
        when($"n_tokens" < 64, 0).when($"n_tokens" < 192, 1).otherwise(2)
          .cast("int"))
      .withColumn("order_key", expr(
        "graft_md5lower64(concat('curr:', cast(doc_id as string))) " +
          "& 9223372036854775807"))
      .select($"doc_id", $"source", $"n_tokens", $"phase", $"order_key")
  }

  /** List aggregation: per-nation sorted roster of supplier names —
    * `collect_set` → `array_sort` → `array_join`, the idiom for
    * building a deterministic delimited list in a distributed
    * aggregate (an unsorted collect_list's order is partition-
    * dependent and would never hash-match anything). Group sizes are
    * bounded (suppliers per nation), which is the precondition for
    * ANY collect-style aggregate at scale — collecting an unbounded
    * group OOMs the reducer, use windowed top-k instead.
    */
  def qCollectList(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_suppliers"),
           array_join(array_sort(collect_set($"s_name")), ",")
             .as("supplier_roster"))
  }

  /** Context-length histogram: documents bucketed by token count in
    * 64-token steps (capped at 512+) per source — the profile that
    * sizes packing efficiency and truncation loss before a training
    * run. Buckets are computed per row before the aggregate, so the
    * shuffle carries ≤ sources × 9 groups regardless of corpus size.
    */
  def txtLengthHist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", expr("cast(size(split(trim(text), ' +')) as bigint)"))
      .withColumn("bucket_lo",
        least($"n_tokens" - ($"n_tokens" % 64), lit(512L)).cast("long"))
      .groupBy($"source", $"bucket_lo")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").cast("long").as("n_tokens"))
  }

  /** Fixed-size token chunking with overlap — the RAG / context-
    * window ingestion splitter: whitespace tokens, 64-token chunks
    * advancing by 48 (16-token overlap so no chunk boundary severs
    * context), each chunk fingerprinted with the md5-63 convention
    * so chunk-level dedup and retrieval indexing can run downstream
    * on `chunk_hash` alone. A doc that fits one chunk emits exactly
    * one; otherwise the last chunk is the shortest suffix that still
    * ends at the final token (never a fully-contained tail).
    *
    * Scale (100 TB): zero shuffle — the chunk INDEX is exploded
    * first and the slice/hash computed per exploded row (Generate is
    * a CollapseProject barrier, so the token array is not recomputed
    * per chunk — the lambda-inlining trap in the verify notes).
    * Output is linear: corpus tokens × (1 + overlap/stride).
    */
  def pipelineChunk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val chunk = 64; val stride = 48
    Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim($"text"), " +").as("w"))
      .withColumn("n", size($"w").cast("long"))
      // chunk count: 1 if n <= chunk else ceil((n-chunk)/stride) + 1.
      // `div` (not `/`) so both engines evaluate the same integer
      // division — the repo's cross-engine arithmetic convention
      .withColumn("hi",
        when($"n" <= chunk, lit(0L))
          .otherwise(expr(s"(n - $chunk + ${stride - 1}) div $stride"))
          .cast("int"))
      .select($"doc_id", $"w", $"n",
              explode(sequence(lit(0), $"hi")).as("i"))
      .select($"doc_id", $"i".cast("long").as("chunk_idx"),
        ($"i" * stride + 1).cast("long").as("start_tok"),
        least(lit(chunk.toLong), $"n" - $"i" * stride).as("n_toks"),
        expr(s"graft_md5lower64(concat_ws(' ', slice(w, i * $stride + 1, $chunk)))" +
             " & 9223372036854775807").as("chunk_hash"))
  }

  /** Data-quality expectation audit (the Deequ/Great-Expectations
    * idiom): per-table constraint checks — key completeness + key
    * uniqueness, domain membership, non-emptiness, derived-column
    * consistency, value bounds — evaluated in ONE aggregate pass per
    * table and reported as (tbl, constraint, n_rows, n_violations).
    * The report never asserts: a production gate alerts on
    * `n_violations > 0`, and the row counts make the check itself
    * auditable (a zero-violation report over zero rows is a broken
    * feed, not a clean one).
    *
    * Scale (100 TB): each table contributes one map-side-combinable
    * aggregate (the uniqueness check rides the same pass as a
    * count-distinct); the unpivot to report rows happens on the
    * 1-row aggregate output, so the shuffle carries constraint
    * partials, never rows. Constraint count × tables is the output
    * bound regardless of corpus size.
    */
  def pipelineExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def viol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(c, 1L).otherwise(0L))
    val docs = Tables.documents(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      viol($"doc_id".isNull).as("key_null"),
      (count(lit(1)) - countDistinct($"doc_id")).as("key_dup"),
      viol($"text".isNull || length($"text") === 0).as("text_empty"),
      viol(!$"lang".isin("de", "en", "es", "fr", "zh")).as("lang_domain"),
      viol($"n_chars" =!= length($"text")).as("nchars_drift"))
      .selectExpr("'documents' AS tbl", "n_rows",
        "stack(5, 'key_null', key_null, 'key_dup', key_dup," +
          " 'text_empty', text_empty, 'lang_domain', lang_domain," +
          " 'nchars_drift', nchars_drift) AS (constraint, n_violations)")
    val orders = Tables.orders(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      viol($"o_orderkey".isNull).as("key_null"),
      (count(lit(1)) - countDistinct($"o_orderkey")).as("key_dup"),
      viol(!($"o_totalprice" > 0.0)).as("price_positive"),
      viol($"o_orderdate".isNull).as("date_null"))
      .selectExpr("'orders' AS tbl", "n_rows",
        "stack(4, 'key_null', key_null, 'key_dup', key_dup," +
          " 'price_positive', price_positive, 'date_null', date_null)" +
          " AS (constraint, n_violations)")
    val events = Tables.events(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      viol($"event_id".isNull).as("key_null"),
      (count(lit(1)) - countDistinct($"event_id")).as("key_dup"),
      viol(!$"event_type".isin(
        "signup", "click", "view", "purchase", "error")).as("type_domain"),
      viol(!($"value" >= 0.0)).as("value_nonneg"),
      viol($"ts".isNull).as("ts_null"))
      .selectExpr("'events' AS tbl", "n_rows",
        "stack(5, 'key_null', key_null, 'key_dup', key_dup," +
          " 'type_domain', type_domain, 'value_nonneg', value_nonneg," +
          " 'ts_null', ts_null) AS (constraint, n_violations)")
    docs.unionByName(orders).unionByName(events)
      .select($"tbl", $"constraint", $"n_rows", $"n_violations")
  }
}
