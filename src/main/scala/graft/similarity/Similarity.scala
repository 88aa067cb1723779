package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.cosineSim
import graft.core.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Scale notes (100 TB): brute force broadcasts the (small) query set
  * against the full candidate scan — linear in candidates, no shuffle
  * until the final per-query top-k. The LSH variant buckets both
  * sides by a random-hyperplane signature so each query only scores
  * its own bucket: candidate work drops by ~2^bits while the shuffle
  * stays a plain equi-join on the bucket id.
  */
object Similarity {

  private[similarity] def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("label"), col("v"))

  /** The bench/oracle query set: corpus vectors with vec_id < 10,
    * shaped `(query_id: long, qv: array<double>)`. Every query-set
    * operator below also takes an ARBITRARY DataFrame of this shape —
    * a library caller passes their own query vectors (they need not
    * exist in the corpus); the zero-arg overloads pin this default so
    * the driver's oracle replay stays byte-stable.
    *
    * Self-exclusion contract: the `excludeSelf` flag (default false
    * on the query-set overloads) drops candidates whose `vec_id`
    * equals the query's `query_id`. It exists for CORPUS-DERIVED
    * query sets — a corpus vector searching for neighbors should not
    * return itself — and the zero-arg overloads pass true. External
    * query sets must NOT set it: an external `query_id` is a caller-
    * chosen label, and excluding by id would silently drop any corpus
    * vector whose id happens to coincide with an unrelated query id.
    */
  def defaultQueries(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    vectors(spark, sfDir).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
  }

  /** Brute-force cosine top-5 per query vector, ties broken by
    * neighbor id. Per-query top-k runs through the bounded-heap
    * aggregate ([[graft.functions.TopK]]): each map partition reduces
    * to ≤ k candidates before the shuffle, so no global sort of the
    * candidate set ever happens — the window-sort equivalent is
    * spec-asserted identical in TopKSpec.
    */
  def simBruteTopk(spark: SparkSession, sfDir: String): DataFrame =
    simBruteTopk(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simBruteTopk(spark: SparkSession, sfDir: String,
                   queries: DataFrame,
                   excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    crossQueries(e, queries, excludeSelf)
      .withColumn("cos", cosineSim($"qv", $"v"))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(5)($"vec_id", $"cos").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "p")))
      .select($"query_id", $"p._1".as("neighbor_id"),
              ($"i" + 1).cast("int").as("rank"),
              round($"p._2", 4).as("cosine"))
  }

  /** Queries broadcast against the corpus scan — with the self-id
    * exclusion when the query set is corpus-derived, a plain cross
    * join (every query scores every candidate) when it is external.
    */
  private def crossQueries(e: DataFrame, queries: DataFrame,
                           excludeSelf: Boolean): DataFrame =
    if (excludeSelf)
      e.join(broadcast(queries), col("query_id") =!= col("vec_id"))
    else e.crossJoin(broadcast(queries))

  def simMmrRerank(spark: SparkSession, sfDir: String): DataFrame =
    simMmrRerank(spark, sfDir, k = 10)

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998 — the diversity pass a retrieval pipeline runs AFTER
    * candidate generation so the final k results aren't k near-
    * duplicates): greedily select k of each query's top-20 brute-
    * cosine candidates, the first by pure relevance, each next by
    * `0.7·rel − 0.3·max_sim_to_already_selected`. Scores are fixed
    * arithmetic trees over exact cosines (no float accumulation —
    * both engines evaluate the identical IEEE expression), rounded
    * only on output; ties break by doc_id.
    *
    * Scale (100 TB): candidate generation is the one corpus-sized
    * stage (the brute scan — swap in any ANN path for production);
    * everything after operates on the |queries|·20 candidate
    * relation: its pairwise-sim table (≤ |queries|·20² rows) is
    * computed ONCE and checkpointed, and each greedy round is an
    * anti-join + max + argmax over those metadata-sized relations,
    * localCheckpoint-ed so the plan stays constant. The greedy loop
    * is inherently sequential in k, never in the corpus.
    */
  def simMmrRerank(spark: SparkSession, sfDir: String,
                   k: Int): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    val cand = crossQueries(e, defaultQueries(spark, sfDir),
        excludeSelf = true)
      .withColumn("cos", cosineSim($"qv", $"v"))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(20)($"vec_id", $"cos").as("top"))
      .select($"query_id", explode($"top").as("p"))
      .select($"query_id", $"p._1".as("doc_id"), $"p._2".as("rel"))
    val cv = cand
      .join(e.select($"vec_id".as("doc_id"), $"v"), Seq("doc_id"))
      .select($"query_id", $"doc_id", $"rel", $"v")
    mmrSelect(cv, k)
  }

  /** The MMR greedy selection over an arbitrary candidate relation
    * (query_id, doc_id, rel, v) — [[simMmrRerank]]'s loop factored
    * out so [[pipelineRag]] reranks its fused candidates through the
    * identical arithmetic tree. The candidate relation must be
    * metadata-sized (per-query top lists): its pairwise-sim table is
    * computed once and checkpointed, and each greedy round is an
    * anti-join + max + argmax over those relations.
    */
  private[graft] def mmrSelect(cand: DataFrame, k: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val cv = cand.localCheckpoint()
    // pairs carry the x side's relevance (constant per (query, a)) so
    // the greedy rounds below never rejoin the candidate relation —
    // one fewer join + broadcast per round (r18 job-profile trim)
    val pairs = cv.as("x").join(cv.as("y"),
        col("x.query_id") === col("y.query_id") &&
        col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.query_id").as("query_id"), col("x.doc_id").as("a"),
              col("y.doc_id").as("b"),
              cosineSim(col("x.v"), col("y.v")).as("sim"),
              col("x.rel").as("rel"))
      .localCheckpoint()
    // argmax by (score desc, doc_id asc) as a map-combinable
    // max(struct(score, −doc_id)) — replaces the per-round window
    // sort (one exchange + sort saved per round). Equivalence incl.
    // the NaN corner: Double.compare ranks NaN GREATEST, so both the
    // desc window and the struct max put a NaN score first; the
    // negated-id second field breaks ties toward the smaller doc_id
    // exactly like the window's `doc_id` asc.
    def argmax(df: DataFrame, rank: Int, scoreCol: Column): DataFrame =
      df.withColumn("score", scoreCol)
        .groupBy($"query_id")
        .agg(max(struct($"score", (-$"doc_id").as("nd"))).as("m"))
        .select($"query_id", (-$"m.nd").as("doc_id"),
                lit(rank).as("mmr_rank"), $"m.score".as("mmr_score"))
    var selected = argmax(cv.select($"query_id", $"doc_id", $"rel"),
        1, $"rel")
      .localCheckpoint()
    for (i <- 2 to k) {
      // every not-yet-selected candidate pairs with every selected
      // doc (the pair relation is complete per query), so the inner
      // selected-join keeps exactly the unselected candidates the old
      // cv-side anti-join kept
      // joins stay un-hinted: AQE broadcasts the checkpointed
      // |queries|·i-row selected relation at any realistic batch size
      // and falls back to a shuffle if a caller ever feeds a huge one
      val pick = argmax(
        pairs
          .join(selected.select($"query_id",
            $"doc_id".as("b")), Seq("query_id", "b"))
          .join(selected.select($"query_id",
            $"doc_id".as("a")), Seq("query_id", "a"), "left_anti")
          .groupBy($"query_id", $"a")
          .agg(max($"sim").as("maxsim"), max($"rel").as("rel"))
          .select($"query_id", $"a".as("doc_id"), $"maxsim", $"rel"),
        i, expr("0.7 * rel - 0.3 * maxsim"))
      selected = selected.union(pick).localCheckpoint()
    }
    selected.select($"query_id", $"doc_id",
      $"mmr_rank".cast("int").as("mmr_rank"),
      round($"mmr_score", 4).as("mmr_score"))
  }

  /** Hybrid lexical + vector retrieval fused by Reciprocal Rank
    * Fusion (Cormack et al. 2009): each query document retrieves a
    * top-20 list twice — BM25-shaped sparse scoring over its rarest
    * terms, and brute cosine over its embedding — and the fused
    * score is `Σ 10⁶ div (60 + rank)` (the canonical RRF with k=60,
    * held in integers so the fusion is bit-stable across engines).
    * The lexical scorer is the engine's integer convention: idf in
    * basis points `((N − df + 1)·10⁴) div (df + 1)`, per-pair score
    * `Σ min(tf_q, tf_d) · idf_bp` — a saturation-free BM25 analog
    * whose long sums are order-insensitive (no float ln; the
    * [[graft.text.TextAnalysis.txtDsirWeights]] arithmetic rules).
    *
    * Scale (100 TB): the classic hybrid-search trap is the posting
    * join on a common term — one stopword joins every document and
    * the candidate set goes corpus-quadratic. Candidacy is therefore
    * bounded BY CONSTRUCTION twice: a term participates only with
    * df ≤ 65536 (the absolute posting-list cap, applied BEFORE term
    * selection), and each query scores only its 20 rarest surviving
    * terms (idf desc, hash tiebreak), so candidate rows ≤
    * |queries| · 20 · 65536 regardless of corpus size. The corpus tf
    * relation is computed once; df/idf is one map-combinable
    * aggregate; the selected query terms broadcast into the posting
    * join. The vector list reuses the brute-scan shape (queries
    * broadcast against one corpus pass). The two rank lists meet in
    * a full outer join on (query, doc) — both already metadata-sized.
    */
  def simHybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // lexical list input: hashed-term tf per doc, one corpus pass,
    // pinned (it feeds df/idf, query-term selection AND the posting
    // join)
    val tf = hybridTf(spark, sfDir).persist()
    // The two retrieval arms are INDEPENDENT corpus passes (brute
    // cosine vs tf posting join) that the single fused action ran as
    // one serial stage chain — materialize them from a 2-thread pool
    // (guide §2.6; rows identical, only job overlap changes), then
    // fuse the two metadata-sized rank lists. Only the lex thread
    // touches the cold tf cache, so no redundant-compute race. The
    // final checkpoint releases the tf cache before returning — the
    // lazy-plan leak the r12 advisor flagged.
    try {
      val Seq(lex, vec) = graft.core.Overlap.run(spark, "simHybridRrf", 2)(Seq(
        () => lexicalRanks(spark, sfDir, tf).localCheckpoint(),
        () => vecTop20(spark, sfDir).localCheckpoint()))
      rrfFuse(lex, vec).localCheckpoint()
    } finally { tf.unpersist(); () }
  }

  /** Hashed-term tf per doc — [[simHybridRrf]]'s lexical input. */
  private[graft] def hybridTf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(expr("split(trim(text), ' +')")).as("w"))
      .select($"doc_id",
        expr("graft_md5lower64(w) & 9223372036854775807").as("h"))
      .groupBy($"doc_id", $"h").agg(count(lit(1)).as("tf"))
  }

  /** The BM25-analog lexical top-20 rank list per query
    * (query_id, doc_id, lex_rank) given the pinned corpus tf relation
    * — [[simHybridRrfPlan]]'s lexical arm, factored out so
    * [[pipelineRag]] fuses the identical list. Candidacy is bounded
    * by construction (df ≤ 65536 posting cap, 20 rarest terms per
    * query) — see [[simHybridRrf]]'s scale notes.
    */
  private[graft] def lexicalRanks(spark: SparkSession, sfDir: String,
                                  tf: DataFrame): DataFrame = {
    import spark.implicits._
    val nDocs = Tables.documents(spark, sfDir).groupBy()
      .agg(count(lit(1)).as("n"))
    val idf = tf.groupBy($"h").agg(count(lit(1)).as("df"))
      .filter($"df" <= 65536)
      .crossJoin(broadcast(nDocs))
      .select($"h", $"df",
        expr("((n - df + 1) * 10000) div (df + 1)").as("idf_bp"))
    val selW = Window.partitionBy($"query_id")
      .orderBy($"idf_bp".desc, $"h")
    val qterms = tf.filter($"doc_id" < 10)
      .select($"doc_id".as("query_id"), $"h", $"tf".as("tfq"))
      .join(idf, Seq("h"))
      .withColumn("r", row_number().over(selW))
      .filter($"r" <= 20)
      .select($"query_id", $"h", $"tfq", $"idf_bp")
    val lexW = Window.partitionBy($"query_id")
      .orderBy($"score".desc, $"doc_id")
    tf.join(broadcast(qterms), Seq("h"))
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id")
      .agg(sum(least($"tfq", $"tf") * $"idf_bp").as("score"))
      .withColumn("lex_rank", row_number().over(lexW).cast("int"))
      .filter($"lex_rank" <= 20)
      .select($"query_id", $"doc_id", $"lex_rank")
  }

  /** The [[simHybridRrf]] plan given the pinned corpus tf relation —
    * factored out so plan audits can inspect the pre-checkpoint shape.
    */
  private[graft] def simHybridRrfPlan(spark: SparkSession, sfDir: String,
      tf: DataFrame): DataFrame =
    rrfFuse(lexicalRanks(spark, sfDir, tf), vecTop20(spark, sfDir))

  /** Vector arm: brute cosine, top-20 ranks per query. */
  private def vecTop20(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    crossQueries(vectors(spark, sfDir),
        defaultQueries(spark, sfDir), excludeSelf = true)
      .withColumn("cos", cosineSim($"qv", $"v"))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(20)($"vec_id", $"cos").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "p")))
      .select($"query_id", $"p._1".as("doc_id"),
              ($"i" + 1).cast("int").as("vec_rank"))
  }

  /** Integer-RRF fusion of the two rank lists — one body so the fused
    * arithmetic cannot diverge between the audited plan builder and
    * the overlapped public entry.
    */
  private def rrfFuse(lexRanks: DataFrame, vecRanks: DataFrame): DataFrame = {
    import lexRanks.sparkSession.implicits._
    val fusedW = Window.partitionBy($"query_id")
      .orderBy($"rrf_e6".desc, $"doc_id")
    lexRanks.join(vecRanks, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
        coalesce(expr("1000000 div (60 + vec_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(fusedW).cast("int"))
      .filter($"rank" <= 10)
      .select($"query_id", $"doc_id", $"rank", $"rrf_e6",
              $"lex_rank", $"vec_rank")
  }

  /** Multi-table random-hyperplane LSH (Indyk–Motwani / Charikar
    * shape): L independent tables of `bits` Gaussian hyperplanes,
    * computed by the native `HyperplaneBuckets` Catalyst expression
    * (fixed seed — deterministic, no stored model). Each row explodes
    * to its L (table, bucket) keys.
    */
  private def withBuckets(df: DataFrame, tables: Int, bits: Int): DataFrame =
    df.withColumn("buckets",
        graft.functions.hyperplaneBuckets(col("v"), tables, bits))
      .select(df.columns.map(col) :+
        posexplode(col("buckets")).as(Seq("table_id", "bucket")): _*)

  /** IVF-style ANN (inverted-file, Jégou et al. shape): the `label`
    * column acts as the coarse quantizer's cell id; cell centroids
    * are the per-label mean vectors. A query probes its `nprobe`=5
    * nearest centroids and scores only those cells' members — the
    * classic 100 TB ANN path: the centroid table is tiny and
    * broadcast, candidate work is corpus/cells × nprobe, and the only
    * wide op is the equi-join on cell id.
    */
  def simIvfAnn(spark: SparkSession, sfDir: String): DataFrame =
    simIvfAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simIvfAnn(spark: SparkSession, sfDir: String,
                queries: DataFrame,
                excludeSelf: Boolean = false): DataFrame =
    ivfTopK(spark, sfDir, queries, excludeSelf, candidateFilter = None)

  /** Shared probe → (optional filter) → score → top-k tail for the
    * IVF family — [[simIvfAnn]] passes no predicate,
    * [[simFilteredAnn]] passes its metadata filter. One body so the
    * two paths cannot diverge; the filter applies to the CANDIDATE
    * stream before scoring (see simFilteredAnn's doc for why that
    * side of top-k is the correct one).
    */
  private def ivfTopK(spark: SparkSession, sfDir: String,
                      queries: DataFrame, excludeSelf: Boolean,
                      candidateFilter: Option[Column]): DataFrame = {
    import spark.implicits._
    val all = vectors(spark, sfDir)
    val vecs = candidateFilter.map(all.filter).getOrElse(all)
    // each query probes its nprobe nearest cells ([[probeCells]] —
    // the same relation simIvfPqAnn restricts by), qv rejoined for
    // the exact scoring stage
    val probes = probeCells(spark, sfDir, queries)
      .join(broadcast(queries), Seq("query_id"))
      .select($"query_id", $"qv", $"cell")
    // score only the probed cells' members; per-query top-k via the
    // bounded-heap aggregate (no candidate sort)
    val cond =
      if (excludeSelf) $"label" === $"cell" && $"vec_id" =!= $"query_id"
      else $"label" === $"cell"
    vecs.join(broadcast(probes), cond)
      .withColumn("cos", cosineSim($"qv", $"v"))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(5)($"vec_id", $"cos").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "p")))
      .select($"query_id", $"p._1".as("neighbor_id"),
              ($"i" + 1).cast("int").as("rank"),
              round($"p._2", 4).as("cosine"))
  }

  /** FILTERED vector search — top-k under a metadata predicate, the
    * serving feature every production vector store grew in the RAG
    * era (FAISS IDSelector / the "filtered ANN" problem): "nearest
    * neighbors among documents matching WHERE ..." — here the
    * predicate is a curated-partition flag (`vec_id % 3 = 0`, the
    * stand-in for an indexed metadata column). The filter composes
    * with the IVF probe, and its ORDER matters at scale: the
    * predicate applies to the candidate stream BEFORE scoring (inside
    * the probed-cells join — at 100 TB a stored-index layout pushes
    * it into the codes scan as a partition/stats prune), never after
    * top-k, which would silently return fewer than k survivors (the
    * classic post-filter recall bug). Exact cosine within probed
    * cells keeps the whole path deterministic — the oracle replays
    * probe → filter → rank bit-for-bit. Recall caveat (documented,
    * spec-asserted vs filtered brute force): restrictive filters
    * thin probed cells, the standard filtered-ANN trade driving
    * nprobe up as selectivity drops.
    */
  def simFilteredAnn(spark: SparkSession, sfDir: String): DataFrame =
    simFilteredAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simFilteredAnn(spark: SparkSession, sfDir: String,
                     queries: DataFrame,
                     excludeSelf: Boolean = false): DataFrame =
    ivfTopK(spark, sfDir, queries, excludeSelf,
      candidateFilter = Some(col("vec_id") % 3 === 0))

  /** Per-label centroid vectors in long form (label, dim_idx,
    * centroid_val) — mean pooling, the coarse-quantizer training step
    * of [[simIvfAnn]] surfaced as its own operator. posexplode keeps
    * the aggregation a plain (label, dim) groupBy: output cardinality
    * is #labels × dims regardless of corpus size.
    */
  def simCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    vectors(spark, sfDir)
      .select($"label", posexplode($"v").as(Seq("dim_idx", "x")))
      .groupBy($"label", $"dim_idx")
      .agg(round(avg($"x"), 4).as("centroid_val"),
           count(lit(1)).as("n_vectors"))
  }

  /** IVF index health audit — the operational profile every vector-DB
    * deployment watches before deciding to retrain its quantizer. Per
    * coarse cell: vector count, corpus share in basis points, expected
    * 1-probe scan-cost share (10⁴·n_c²/Σn² — the probability-weighted
    * fraction of distance computations a query stream that lands on
    * cells proportionally to their mass spends in this cell; a
    * balanced index has every cell near 10⁴/k, a degenerate one puts
    * most scan cost in a few hot cells), and coherence mass (sum of
    * each member's cosine to its cell centroid, rounded per vector —
    * the quantization-quality proxy: low coherence per vector = the
    * cell is too coarse for its contents).
    *
    * Scale (100 TB): centroids come from ONE map-combinable
    * posexplode aggregate (cells × dims groups); the per-vector
    * cosine is a broadcast join of the tiny centroid table back to
    * the corpus scan; the global total/Σn² denominators ride a
    * broadcast single-row crossJoin over the CELL-level aggregate
    * (k rows, never the corpus). Shares are exact integer division;
    * coherence sums 4-decimal roundeds — integer multiples of 1e-4
    * far below 2⁵³, so the double sum is exact on any engine and
    * addition order cannot flip it.
    */
  def simIndexProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vecs = vectors(spark, sfDir)
    val cent = vecs
      .select($"label", posexplode($"v").as(Seq("i", "x")))
      .groupBy($"label", $"i").agg(avg($"x").as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"i", $"m"))).as("ps"))
      .select($"label", expr("transform(ps, p -> p.m)").as("cv"))
    // checkpoint the k-row cell aggregate: it feeds BOTH the totals
    // row and the output side, and unpinned the corpus-wide cosine
    // pass behind it would evaluate once per consumer (the
    // no-ReusedExchange self-join behavior measured in simRecallEval)
    val cells = vecs.join(broadcast(cent), Seq("label"))
      .select($"label".as("cell"),
              round(graft.functions.cosineSim($"v", $"cv"), 4).as("cos4"))
      .groupBy($"cell")
      .agg(count(lit(1)).as("n_vectors"),
           round(sum($"cos4"), 4).as("coherence"))
      .localCheckpoint()
    // quadratic terms in decimal(38,0): 10⁴·n² wraps a Long silently
    // once a cell holds ~3e7 vectors (the r12 advisor's overflow
    // finding) — decimal is exact to n ≈ 1e16 per cell, far past any
    // 100 TB shard; DuckDB mirrors with HUGEINT. `div` on decimals
    // still yields BIGINT, so the output schema is unchanged.
    val totals = cells.agg(
      sum($"n_vectors").as("total"),
      sum($"n_vectors".cast("decimal(38,0)") * $"n_vectors").as("sumsq"))
    cells.crossJoin(broadcast(totals))
      .select($"cell", $"n_vectors",
        expr("(10000 * n_vectors) div total").as("share_bp"),
        expr("(cast(10000 as decimal(38,0)) * n_vectors * n_vectors) " +
             "div sumsq").as("scan_bp"),
        $"coherence")
  }

  /** Approximate kNN graph over the WHOLE corpus (not just a query
    * set): every vector's top-5 cosine neighbors within its coarse
    * cell (`label`), the 1-probe IVF approximation used to build
    * embedding kNN graphs for clustering/near-dup sweeps. Work is
    * Σ|cell|² (never corpus²), the only wide op is the self-join's
    * single canonicalized exchange on the cell id, and per-vector
    * top-k runs through the bounded-heap aggregate — no sort of the
    * candidate lists. Within-cell exactness vs the window path is
    * spec-asserted in TopKSpec.
    *
    * The Σ|cell|² bound is only as good as the quantizer granularity:
    * this corpus's `label` column has a fixed cell count, so at 100 TB
    * the operator's contract is that the coarse quantizer is trained
    * with k ∝ √N cells (standard IVF sizing — cells of ~√N vectors
    * make Σ|cell|² ≈ N^1.5, not N²); the labels here stand in for
    * that trained quantizer exactly as in [[simIvfAnn]].
    */
  def simKnnGraph(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // pack each cell ONCE (a single corpus-sized shuffle), then the
    // CellTopK generator scores members in-memory — the self-join
    // formulation shipped Σ|cell|² pair rows each carrying two full
    // vectors (~1 KB/row) through the exchange, which dominated the
    // query (measured ~7 s at sf1 vs ~1 s packed)
    vectors(spark, sfDir)
      .groupBy($"label")
      .agg(collect_list(struct($"vec_id", $"v")).as("vecs"))
      .select(graft.functions.cellTopK($"vecs", 5)
        .as(Seq("vec_id", "neighbor_id", "rank", "cosine")))
      .select($"vec_id", $"neighbor_id", $"rank",
              round($"cosine", 4).as("cosine"))
  }

  /** Product-quantization ANN (Jégou et al. TPAMI'11 shape): vectors
    * split into M=8 subspaces of 8 dims, each subvector quantized to
    * an 8-bit code — the classic 256-code PQ codebook size — via a
    * STRUCTURED quantizer: the code is the subvector's sign pattern,
    * and the codebook entry is the mean of the subvectors sharing
    * that pattern. (A label-mean codebook was tried first and
    * collapses to near-chance recall ≈ 5/|label|: every vector in a
    * label gets identical codes, so ADC cannot rank within a label —
    * codes must vary inside whatever partition the true neighbors
    * share. The sign quantizer also makes encoding FREE: no
    * nearest-centroid search pass, the code is a per-row expression,
    * exactly like LSH bucket assignment.)
    *
    * Query scoring is cosine-ADC: the query's partial inner products
    * against every sub-centroid form a small broadcast table; a
    * vector's score is its M summed lookups divided by the query and
    * reconstruction norms. Raw inner product (no norm division) ranks
    * by magnitude, not direction, and recall collapses toward chance.
    *
    * The 100 TB story: after encoding, each vector is M bytes (a 32×
    * compression of the 64-float vector), scoring never touches raw
    * vectors (codes ⋈ broadcast ADC table, one partial-agg sum), and
    * the bounded-heap top-k avoids any sort. The whole path is
    * deterministic (sign codes are exact integer expressions, codebook
    * means are rounded before ADC, ranking uses the rounded score), so
    * the DuckDB oracle replays codes → codebook → ADC → top-5
    * bit-for-bit; recall vs brute force is spec-asserted (DedupSimSpec).
    */
  /** Shared PQ-ADC scoring: every (query, corpus-vector) candidate
    * with its rounded cosine-ADC score `rscore`. Both [[simPqAnn]]
    * (direct top-5) and [[simPqRerank]] (top-100 shortlist → exact
    * re-rank) consume this frame.
    */
  // No lambda HOFs anywhere in the corpus-wide PQ path: transform /
  // aggregate / zip_with lambdas run INTERPRETED per element (and
  // project-collapse re-inlines hoisted subexpressions into them),
  // which measured ~18 s at sf0.1. Everything per-row below is
  // plain element_at arithmetic — codegen'd. Normalizing the corpus
  // is unnecessary: positive scaling never flips a sign code, and
  // the score already divides by the reconstruction's norm.
  private[similarity] def dot8(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    (0 until 8).map(d => element_at(a, d + 1) * element_at(b, d + 1)).reduce(_ + _)
  private[similarity] def subSlices(v: org.apache.spark.sql.Column) =
    array((0 until 8).map(m => slice(v, m * 8 + 1, 8)): _*)

  /** 8-bit sign-pattern PQ code of the `subv` column — intrinsic to
    * the subvector (no codebook lookup), which is what makes encoding
    * free AND corpus-independent: an appended vector's codes are the
    * same whether the index was seeded before or after it arrived.
    */
  private[similarity] def signCodeExpr: org.apache.spark.sql.Column =
    (0 until 8)
      .map(d => when(element_at(col("subv"), d + 1) > 0d, 1 << d).otherwise(0))
      .reduce(_ + _).cast("int")

  /** Per-vector PQ codes of a (vec_id, label, v) frame: one row per
    * (vec_id, subspace) with the 8-bit sign code, label carried for
    * IVF cell restriction. The encode arm shared by [[pqEncode]] and
    * the stored-index append path ([[AnnIndex.append]]).
    */
  private[similarity] def signCodes(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    vecs.withColumn("subvs", subSlices($"v"))
      .select($"vec_id", $"label", posexplode($"subvs").as(Seq("m", "subv")))
      .withColumn("code", signCodeExpr)
      .select($"vec_id", $"label", $"m", $"code")
  }

  /** PQ encode of a (vec_id, label, v) corpus: `subs` (persisted —
    * codes and codebook both reference it), the ≤ 256-entry-per-
    * subspace `codebook`, and the M-bytes-per-vector `codes`.
    *
    * The `subs` pin follows the repo's pinned-relation convention
    * (see dedup_ngram): it is reclaimed by the caller's
    * `spark.catalog.clearCache()` (Bench does this per query), or a
    * long-lived session can `unpersist()` the returned handle once
    * the derived frames are materialized.
    */
  private[similarity] def pqEncode(vecs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    import vecs.sparkSession.implicits._
    // two consumers (codes, codebook) reference this subtree — persist
    // once instead of re-slicing the corpus per reference (the same
    // pin-the-edge-set pattern as minhash's band relation)
    // label (the coarse cell id) rides along so IVFADC can restrict
    // codes to probed cells WITHOUT a corpus-corpus join back to the
    // vectors table — at 100 TB that join is a full shuffle; a carried
    // column is free
    val subs = vecs
      .withColumn("subvs", subSlices($"v"))
      .select($"vec_id", $"label",
        posexplode($"subvs").as(Seq("m", "subv")))
      // 8-bit sign-pattern code per subvector (free encode, no search)
      .withColumn("code", signCodeExpr)
      .persist()
    // codebook: per (subspace, code) mean subvector — ≤ 256 entries
    // per subspace regardless of corpus size, broadcast. The mean is
    // rounded to 6 decimals BEFORE any ADC arithmetic: a float mean is
    // the one order-dependent aggregate in the pipeline (Spark and the
    // oracle sum partitions in different orders), and rounding collapses
    // the ulp noise so both engines feed bit-identical codebook entries
    // into the (fixed-order, deterministic) dot products downstream.
    val codebook = subs
      .select($"m", $"code", posexplode($"subv").as(Seq("dim", "x")))
      .groupBy($"m", $"code", $"dim").agg(round(avg($"x"), 6).as("c"))
      .groupBy($"m", $"code")
      .agg(array_sort(collect_list(struct($"dim", $"c"))).as("pairs"))
      .select($"m", $"code", expr("transform(pairs, p -> p.c)").as("cv"))
    val codes = subs.select($"vec_id", $"label", $"m", $"code")
    (subs, codebook, codes)
  }

  /** ADC lookup tables for a query set: partial inner product plus
    * the sub-centroid's squared norm (for the reconstruction norm)
    * and the query subvector's squared norm (for the query norm) —
    * the tiny query×codebook frame is the only place these evaluate.
    * Query subvectors are sliced from the caller's `qv` directly, so
    * the query set need not exist in the corpus.
    */
  private[similarity] def pqAdcTables(queries: DataFrame, codebook: DataFrame): DataFrame = {
    import queries.sparkSession.implicits._
    queries
      .withColumn("subvs", subSlices($"qv"))
      .select($"query_id", posexplode($"subvs").as(Seq("m", "qsub")))
      .join(broadcast(codebook), Seq("m"))
      .withColumn("partial", dot8($"qsub", $"cv"))
      .withColumn("cnorm2", dot8($"cv", $"cv"))
      .withColumn("qnorm2", dot8($"qsub", $"qsub"))
      .select($"query_id", $"m", $"code", $"partial", $"cnorm2", $"qnorm2")
  }

  /** Sum a frame of per-(query, vec, subspace) ADC lookups into the
    * rounded cosine-ADC score per (query, vec).
    */
  private[similarity] def adcScore(lookups: DataFrame,
                                   excludeSelf: Boolean): DataFrame = {
    import lookups.sparkSession.implicits._
    (if (excludeSelf) lookups.filter($"vec_id" =!= $"query_id")
     else lookups)
      .groupBy($"query_id", $"vec_id")
      // Σpartial / (‖q‖·‖recon‖) = cosine of the query with the
      // vector's PQ reconstruction (qnorm2 summed over the same M
      // lookups reconstitutes ‖q‖²)
      .agg((sum($"partial") / (sqrt(sum($"qnorm2")) * sqrt(sum($"cnorm2"))))
        .as("score"))
      // rank by the ROUNDED score: vectors sharing all 8 codes have
      // identical lookups, but an 8-double sum is order-dependent, so
      // their raw scores can differ in the last ulp and the tie would
      // be broken by noise instead of by vec_id. Rounding first makes
      // equal-code candidates exactly equal, so the heap's id
      // tie-break is deterministic and oracle-reproducible.
      .withColumn("rscore", round($"score", 4))
      .select($"query_id", $"vec_id", $"rscore")
  }

  private def pqScored(spark: SparkSession, sfDir: String,
                       queries: DataFrame,
                       excludeSelf: Boolean): DataFrame = {
    import spark.implicits._
    val (_, codebook, codes) = pqEncode(vectors(spark, sfDir))
    adcScore(codes.join(broadcast(pqAdcTables(queries, codebook)),
      Seq("m", "code")), excludeSelf)
  }

  def simPqAnn(spark: SparkSession, sfDir: String): DataFrame =
    simPqAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simPqAnn(spark: SparkSession, sfDir: String,
               queries: DataFrame,
               excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    pqScored(spark, sfDir, queries, excludeSelf)
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(5)($"vec_id", $"rscore").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "p")))
      .select($"query_id", $"p._1".as("neighbor_id"),
              ($"i" + 1).cast("int").as("rank"),
              $"p._2".as("approx_score"))
  }

  /** Two-stage retrieval, the shape production 100 TB ANN actually
    * runs (Jégou et al. §V: ADC shortlist, exact re-rank): the PQ-ADC
    * stage shortlists the top-100 candidates per query from the
    * compressed codes (never touching raw vectors), then ONLY the
    * shortlist's raw vectors are fetched and re-scored with exact
    * cosine to produce the final top-5. Per query the exact stage
    * reads 100 vectors regardless of corpus size — the expensive scan
    * stays on the 8-byte codes, and recall strictly dominates plain
    * PQ top-5 because the true neighbors survive a 100-wide shortlist
    * far more often than a 5-wide one (spec-asserted vs
    * [[simBruteTopk]] in DedupSimSpec).
    *
    * Deterministic end-to-end: the shortlist ranks by the rounded ADC
    * score (id tie-break), the re-rank by exact cosine — so the
    * DuckDB oracle replays both stages bit-for-bit.
    */
  def simPqRerank(spark: SparkSession, sfDir: String): DataFrame =
    simPqRerank(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simPqRerank(spark: SparkSession, sfDir: String,
                  queries: DataFrame,
                  excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val shortlist = pqScored(spark, sfDir, queries, excludeSelf)
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(100)($"vec_id", $"rscore").as("top"))
      .select($"query_id", explode($"top._1").as("vec_id"))
    // fetch raw vectors for shortlist members only (equi-join on id —
    // at scale this is the point-lookup stage against the vector
    // store), exact cosine, bounded-heap top-5
    exactTop5(shortlist, vectors(spark, sfDir), queries)
  }

  /** Scalar-quantization (int8) ANN — the third quantization scheme
    * of the family (FAISS `SQ8` / the Milvus-style IVF_SQ8 building
    * block, alongside [[simPqAnn]]'s product codes and
    * [[simIvfAnn]]'s coarse cells): train per-DIMENSION [lo, hi]
    * ranges over the corpus, affine-map every component to an int8
    * code ⌊(x−lo)/(hi−lo)·255⌋, shortlist by the CENTERED integer
    * dot product Σ (qc−128)(cc−128), and re-rank the top-20 with
    * exact cosine (the [[simPqRerank]] two-stage contract).
    *
    * Why this matters at 100 TB: 4× memory compression with ZERO
    * lookup tables — the scored representation is a flat byte array
    * per vector and the scan is a pure integer multiply-add, the
    * cheapest SIMD-able ANN kernel there is (PQ trades more
    * compression for table lookups; SQ trades less for raw ALU
    * speed). The trained model is two 64-float arrays — broadcast as
    * a one-row literal relation, never a join. Integer scores are
    * engine-exact, so shortlist membership is deterministic
    * (ties by vec_id) and the DuckDB oracle replays
    * train → quantize → int-dot → shortlist → exact re-rank
    * bit-for-bit.
    */
  def simSqAnn(spark: SparkSession, sfDir: String): DataFrame =
    simSqAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  /** Trained SQ model: per-dimension [lo, hi] — a 64-row aggregate
    * folded to one row of two arrays (dims are fixed; the struct
    * sort keys on d, making the array order deterministic).
    */
  private[similarity] def sqRanges(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.select(posexplode($"v").as(Seq("d", "x")))
      .groupBy($"d").agg(min($"x").as("lo"), max($"x").as("hi"))
      .agg(expr("array_sort(collect_list(struct(d, lo, hi)))").as("rs"))
      .select(expr("transform(rs, r -> r.lo)").as("lo"),
              expr("transform(rs, r -> r.hi)").as("hi"))
  }

  /** The identical affine int8 map on corpus and query vectors; a
    * degenerate dimension (hi = lo) codes to 0 everywhere.
    */
  private[similarity] def sqQuantize(df: DataFrame, ranges: DataFrame,
                         vcol: String, out: String): DataFrame =
    df.crossJoin(broadcast(ranges)).withColumn(out, expr(
      s"transform(sequence(0, size($vcol) - 1), i -> " +
        "CASE WHEN hi[i] = lo[i] THEN 0 ELSE " +
        s"cast(least(greatest(floor(($vcol[i] - lo[i]) " +
        "/ (hi[i] - lo[i]) * 255.0), 0D), 255D) as int) END)"))
      .drop("lo", "hi")

  /** Centered integer dot product of two int8 code arrays. */
  private[similarity] val sqDot =
    "aggregate(zip_with(qc, cc, (a, b) -> " +
      "cast((a - 128) * (b - 128) as bigint)), 0L, (acc, x) -> acc + x)"

  def simSqAnn(spark: SparkSession, sfDir: String,
               queries: DataFrame,
               excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    val ranges = sqRanges(e)
    val coded = sqQuantize(e.select($"vec_id", $"v"), ranges, "v", "cc")
    val qcoded = sqQuantize(queries, ranges, "qv", "qc")
      .select($"query_id", $"qc")
    val scored = (if (excludeSelf)
        coded.join(broadcast(qcoded), col("query_id") =!= col("vec_id"))
      else coded.crossJoin(broadcast(qcoded)))
      .withColumn("score", expr(sqDot))
    val shortlist = scored.groupBy($"query_id")
      .agg(graft.functions.TopK.topK(20)($"vec_id", $"score".cast("double"))
        .as("top"))
      .select($"query_id", explode($"top._1").as("vec_id"))
    exactTop5(shortlist, e, queries)
  }

  /** Binary (sign-bit) quantization ANN — the 1-bit face of the
    * quantization matrix (faiss `IndexBinaryFlat` shape, the
    * binary-code front-end of the RaBitQ family): each 64-dim vector
    * compresses 64× to ONE 8-byte long (bit i = sign of dim i), the
    * candidate scan is xor + popcount (both codegen'd integer ops —
    * no array touch, no float math, 8 bytes/vector), and the
    * hamming top-20 shortlist re-ranks with exact cosine. Hamming on
    * sign bits approximates angular distance (the Charikar
    * hyperplane bound with axis-aligned planes — [[simLshAnn]]'s
    * random rotations traded away for a model-free 8-byte code).
    *
    * Scale (100 TB): the corpus-side scan reads 8 bytes per vector —
    * at 10¹¹ vectors an 800 GB code table vs 25 TB of float32 — and
    * the only wide op is the per-query bounded-heap top-k; queries
    * broadcast. Oracle note: DuckDB raises on `1::BIGINT << 63`
    * (sign bit), so the oracle computes hamming as the COUNT OF
    * DIFFERING SIGN PREDICATES — identical semantics, no packing.
    */
  def simBinaryAnn(spark: SparkSession, sfDir: String): DataFrame =
    simBinaryAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simBinaryAnn(spark: SparkSession, sfDir: String,
                   queries: DataFrame,
                   excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    def signCode(vcol: String) = expr(
      s"aggregate(sequence(0, size($vcol) - 1), 0L, " +
        s"(acc, i) -> acc + if($vcol[i] > 0D, shiftleft(1L, i), 0L))")
    val coded = e.select($"vec_id", signCode("v").as("code"))
    val qcoded = queries.select($"query_id", signCode("qv").as("qcode"))
    val scored = (if (excludeSelf)
        coded.join(broadcast(qcoded), col("query_id") =!= col("vec_id"))
      else coded.crossJoin(broadcast(qcoded)))
      .withColumn("hamming", expr("bit_count(code ^ qcode)"))
    val shortlist = scored.groupBy($"query_id")
      .agg(graft.functions.TopK.topK(20)($"vec_id",
        -$"hamming".cast("double")).as("top"))
      .select($"query_id", explode($"top._1").as("vec_id"))
    exactTop5(shortlist, e, queries)
  }

  /** IVF + SQ8 composed ANN — the FAISS `IVFx,SQ8` index, completing
    * the quantization matrix ([[simIvfPqAnn]] composes cells with PQ
    * codes; this composes them with [[simSqAnn]]'s scalar codes): the
    * coarse probe restricts candidates to each query's nprobe=5
    * nearest cells, and ONLY those cells' int8 codes are scored with
    * the centered integer dot, then the top-20 shortlist re-ranks
    * with exact cosine. vs IVF+PQ: 4× (not 32×) compression but a
    * table-free integer multiply-add scan — the right trade when the
    * scan is ALU-bound rather than memory-bound. Candidate work is
    * corpus × nprobe/cells; the probe relation and the quantized
    * queries broadcast; the one corpus-wide op is the equi-join of
    * codes to their cell's probing queries, exactly the
    * [[simIvfPqAnn]] shape.
    */
  def simIvfSq(spark: SparkSession, sfDir: String): DataFrame =
    simIvfSq(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simIvfSq(spark: SparkSession, sfDir: String,
               queries: DataFrame,
               excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    val ranges = sqRanges(e)
    val coded = sqQuantize(
      e.select($"vec_id", $"label", $"v"), ranges, "v", "cc")
    val qcoded = sqQuantize(queries, ranges, "qv", "qc")
      .select($"query_id", $"qc")
    val probes = probeCells(spark, sfDir, queries)
      .join(broadcast(qcoded), Seq("query_id"))
    exactTop5(ivfSqShortlist(coded, probes, excludeSelf), e, queries)
  }

  /** The IVF+SQ8 shortlist stage — ONE definition shared by the
    * recompute path above and the stored-index path
    * ([[AnnIndex.querySq]]), so the two twins cannot silently diverge
    * in shortlist width, scoring, or tie-breaking (the same sharing
    * discipline as [[exactTop5]]). `codes` = (vec_id, label, cc),
    * `probes` = (query_id, cell, qc).
    */
  private[similarity] def ivfSqShortlist(codes: DataFrame,
                                         probes: DataFrame,
                                         excludeSelf: Boolean): DataFrame = {
    import codes.sparkSession.implicits._
    val cond =
      if (excludeSelf) $"label" === $"cell" && $"vec_id" =!= $"query_id"
      else $"label" === $"cell"
    codes.join(broadcast(probes), cond)
      .withColumn("score", expr(sqDot))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(20)($"vec_id", $"score".cast("double"))
        .as("top"))
      .select($"query_id", explode($"top._1").as("vec_id"))
  }

  /** Matryoshka (truncated-dimension) two-stage ANN — the MRL serving
    * pattern (Kusupati et al. '22; OpenAI/Nomic "shortening
    * embeddings"): score the shortlist on only the FIRST 16 of 64
    * dimensions (for MRL-trained embeddings the information-dense
    * prefix), then re-rank the top-40 with full-dimension exact
    * cosine. The cheapest of the family's first stages: no trained
    * model AT ALL (PQ needs codebooks, SQ needs ranges, IVF needs
    * centroids) — the "index" is just reading a prefix of the vector
    * column, which at 100 TB means the stage-1 scan moves 4× fewer
    * bytes (a `slice` projection the columnar reader serves without
    * touching the tail; with vectors stored dimension-chunked it's
    * column pruning). Same two-stage contract as [[simPqRerank]] /
    * [[simSqAnn]]: shortlist membership decided by stage-1 score with
    * vec_id ties, exact top-5 out.
    */
  def simMatryoshka(spark: SparkSession, sfDir: String): DataFrame =
    simMatryoshka(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simMatryoshka(spark: SparkSession, sfDir: String,
                    queries: DataFrame,
                    excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    exactTop5(matryoshkaShortlist(e, queries, excludeSelf), e, queries)
  }

  /** The Matryoshka prefix-scan shortlist stage — shared by the
    * recompute path above and the stored-vector path
    * ([[AnnIndex.queryMatryoshka]]); `vecs` = (vec_id, v).
    */
  private[similarity] def matryoshkaShortlist(vecs: DataFrame,
                                              queries: DataFrame,
                                              excludeSelf: Boolean): DataFrame = {
    import vecs.sparkSession.implicits._
    crossQueries(
        vecs.withColumn("vh", expr("slice(v, 1, 16)")).select($"vec_id", $"vh"),
        queries.withColumn("qh", expr("slice(qv, 1, 16)"))
          .select(col("query_id"), col("qh")),
        excludeSelf)
      .withColumn("hs", cosineSim($"qh", $"vh"))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(40)($"vec_id", $"hs").as("top"))
      .select($"query_id", explode($"top._1").as("vec_id"))
  }

  /** IVF + PQ composed ANN — the canonical IVFADC index (Jégou et
    * al. TPAMI'11 §V / the FAISS `IVFx,PQy` shape): the coarse
    * quantizer (label cells, as [[simIvfAnn]]) picks each query's
    * nprobe=5 nearest cells, and ONLY those cells' PQ codes are
    * ADC-scored. This composes the two scale levers the separate
    * operators demonstrate: the probe cuts candidates to
    * corpus × nprobe/cells, and scoring each candidate touches M
    * code bytes instead of the raw vector. At 100 TB this is the
    * memory-resident index layout: per probed cell, a contiguous
    * code list scanned with table lookups, raw vectors never read.
    *
    * The probe relation (queries × nprobe rows) and the ADC tables
    * broadcast; the only corpus-wide op is the equi-join of codes to
    * their cell's probing queries. Deterministic end-to-end (raw-
    * cosine probe is the oracle-green [[simIvfAnn]] one; scoring
    * ranks by the rounded ADC score), so the DuckDB oracle replays
    * probe → codes → codebook → ADC → top-5 bit-for-bit.
    */
  def simIvfPqAnn(spark: SparkSession, sfDir: String): DataFrame =
    simIvfPqAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simIvfPqAnn(spark: SparkSession, sfDir: String,
                  queries: DataFrame,
                  excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val vecs = vectors(spark, sfDir)
    val probes = probeCells(spark, sfDir, queries)
    val (_, codebook, codes) = pqEncode(vecs)
    // restrict scoring to probed cells: codes carry their cell id
    // (pqEncode), the tiny probe relation fans each code row out to
    // ONLY the queries probing its cell, then the ADC join adds the
    // lookups — both join sides against the corpus are broadcast
    val lookups = codes
      .join(broadcast(probes), $"label" === $"cell")
      .join(broadcast(pqAdcTables(queries, codebook)),
        Seq("query_id", "m", "code"))
    adcTop5(adcScore(lookups, excludeSelf))
  }

  /** Final top-5 projection over an [[adcScore]] frame — shared by
    * [[simIvfPqAnn]] and [[AnnIndex.query]] so the recompute-per-query
    * and stored-index paths emit byte-identical shapes.
    */
  private[similarity] def adcTop5(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    scored
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(5)($"vec_id", $"rscore").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "p")))
      .select($"query_id", $"p._1".as("neighbor_id"),
              ($"i" + 1).cast("int").as("rank"),
              $"p._2".as("approx_score"))
  }

  /** The coarse-quantizer probe: each query's nprobe nearest cells by
    * centroid cosine (ties by cell id) — the candidate-restriction
    * relation [[simIvfAnn]] and [[simIvfPqAnn]] both score within,
    * exposed so callers (and specs) can inspect exactly which cells a
    * query touches. Output is queries × nprobe rows: broadcast-sized.
    */
  /** The exact-rerank tail every two-stage ANN shares: point-lookup
    * the shortlist's raw vectors (equi-join on id — at scale, the
    * fetch against the vector store), exact cosine, bounded-heap
    * top-5 with ties by neighbor id. Also the stored-index tail
    * ([[AnnIndex.querySq]]), where `corpus` is the persisted vector
    * artifact instead of the live table.
    */
  private[similarity] def exactTop5(shortlist: DataFrame, corpus: DataFrame,
                                    queries: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    shortlist
      .join(corpus.select($"vec_id", $"v"), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", cosineSim($"qv", $"v"))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(5)($"vec_id", $"cos").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "p")))
      .select($"query_id", $"p._1".as("neighbor_id"),
              ($"i" + 1).cast("int").as("rank"),
              round($"p._2", 4).as("cosine"))
  }

  def probeCells(spark: SparkSession, sfDir: String, queries: DataFrame,
                 nprobe: Int = 5): DataFrame =
    probeFrom(centroidsOf(vectors(spark, sfDir)), queries, nprobe)

  /** Coarse-quantizer centroids of a (vec_id, label, v) corpus as a
    * `(cell, cv)` frame — the trainable artifact [[AnnIndex.seed]]
    * persists and [[probeFrom]] probes against.
    */
  private[similarity] def centroidsOf(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    vecs
      .select($"label", posexplode($"v").as(Seq("dim", "x")))
      .groupBy($"label", $"dim").agg(avg($"x").as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"dim", $"m"))).as("pairs"))
      .select($"label".as("cell"), expr("transform(pairs, p -> p.m)").as("cv"))
  }

  /** The probe against an explicit `(cell, cv)` centroid frame —
    * recomputed per query in [[probeCells]], read from the stored
    * artifact in [[AnnIndex.query]].
    */
  private[similarity] def probeFrom(centroids: DataFrame, queries: DataFrame,
                                    nprobe: Int): DataFrame = {
    import centroids.sparkSession.implicits._
    queries.join(broadcast(centroids))
      .withColumn("ccos", cosineSim($"qv", $"cv"))
      .withColumn("crank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"ccos".desc, $"cell")))
      .filter($"crank" <= nprobe)
      .select($"query_id", $"cell")
  }

  /** Range search: every corpus vector within cosine ≥ 0.3 of each
    * query vector (vec_id < 10) — threshold semantics, the complement
    * of top-k. Queries broadcast against a single linear scan of the
    * corpus: no shuffle at all until results surface, so throughput
    * is scan-bound regardless of how many neighbors qualify (a top-k
    * heap would cap them; a threshold must not).
    */
  def simRangeSearch(spark: SparkSession, sfDir: String): DataFrame =
    simRangeSearch(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simRangeSearch(spark: SparkSession, sfDir: String,
                     queries: DataFrame,
                     excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    crossQueries(e, queries, excludeSelf)
      .withColumn("cos", cosineSim($"qv", $"v"))
      // 0.3 keeps the result non-empty at every test SF (0.4 matches
      // nothing at sf0.001 — a vacuously green row checks nothing)
      .filter(round($"cos", 4) >= 0.3)
      .select($"query_id", $"vec_id".as("neighbor_id"),
              round($"cos", 4).as("cosine"))
  }

  /** LSH-bucketed ANN: queries (vec_id < 10) score only candidates
    * co-bucketed with them in at least one of the 8 tables (union of
    * candidates, deduped), then exact-cosine top-5. Rows-only check;
    * recall vs [[simBruteTopk]] asserted in SimilaritySpec.
    * The 8×4-bit shape is tuned for this corpus's weak (cos≈0.5)
    * neighbors; with true near-dup neighbors fewer, deeper tables
    * prune far harder.
    */
  def simLshAnn(spark: SparkSession, sfDir: String): DataFrame =
    simLshAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  def simLshAnn(spark: SparkSession, sfDir: String,
                queries: DataFrame,
                excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val (tables, bits) = (8, 4)
    val vecs = vectors(spark, sfDir)
    // bucket keys only — vector payloads rejoin after candidate dedup
    val keys = withBuckets(vecs, tables, bits)
      .select($"table_id", $"bucket", $"vec_id")
    // queries hash through the SAME fixed-seed hyperplanes, so an
    // external query vector lands in exactly the bucket its corpus
    // twin would
    val qKeys = withBuckets(
        queries.select($"query_id", $"qv".as("v")), tables, bits)
      .select($"table_id", $"bucket", $"query_id")
    val cobucketed = keys.join(broadcast(qKeys), Seq("table_id", "bucket"))
    val candidates =
      (if (excludeSelf) cobucketed.filter($"query_id" =!= $"vec_id")
       else cobucketed)
      .select($"query_id", $"vec_id").distinct()
    candidates
      .join(vecs.select($"vec_id", $"v"), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", cosineSim($"qv", $"v"))
      .groupBy($"query_id")
      .agg(graft.functions.TopK.topK(5)($"vec_id", $"cos").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "p")))
      .select($"query_id", $"p._1".as("neighbor_id"),
              ($"i" + 1).cast("int").as("rank"),
              round($"p._2", 4).as("cosine"))
  }

  /** ANN index-quality evaluation — recall@5 of each approximate
    * method (LSH, IVF, IVF+PQ) against the exact brute-force top-5,
    * per query and method, in integer basis points. The measurement
    * every production retrieval deployment runs before trusting an
    * index — here a first-class operator whose result hash-checks,
    * because every constituent path is already deterministic.
    *
    * Scale notes (100 TB): the evaluation itself is query-set-sized —
    * all joins carry (query_id, neighbor_id) pairs, k rows per query
    * per method. The heavy lifting is the constituent operators,
    * which keep their own scale shapes; the brute-force baseline is
    * the one corpus-linear scan, priced per evaluation batch (a few
    * hundred audit queries), never per corpus query.
    */
  def simRecallEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the exact ground truth feeds every method's hit join AND the
    // query roster — pin it, or AQE recomputes the brute-force scan
    // once per union branch (self-joins get no ReusedExchange).
    // Materialize it BEFORE the concurrent branch jobs below: a cold
    // persisted relation first touched by several concurrent jobs can
    // be computed redundantly by each of them.
    val brute = simBruteTopk(spark, sfDir)
      .select($"query_id", $"neighbor_id").persist()
    brute.count()
    val queries = brute.select($"query_id").distinct()
    def recallOf(method: String, df: DataFrame): DataFrame = {
      val hits = df.select($"query_id", $"neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("h"))
      queries.join(hits, Seq("query_id"), "left_outer")
        .select($"query_id", lit(method).as("method"),
          coalesce($"h", lit(0L)).as("hits"))
        .withColumn("recall_bp", expr("(10000 * hits) div 5"))
    }
    // the full deterministic quantization matrix — the audit a
    // production deployment runs before picking its serving scheme
    // (IVF+SQ8's ranking behavior is covered by the sq8 + ivf rows;
    // its inline oracle replay is the sf10 spill case)
    val methods: Seq[(String, DataFrame)] = Seq(
      "lsh"        -> simLshAnn(spark, sfDir),
      "ivf"        -> simIvfAnn(spark, sfDir),
      "ivfpq"      -> simIvfPqAnn(spark, sfDir),
      "sq8"        -> simSqAnn(spark, sfDir),
      "pq"         -> simPqAnn(spark, sfDir),
      "pq_rerank"  -> simPqRerank(spark, sfDir),
      "matryoshka" -> simMatryoshka(spark, sfDir),
      "binary"     -> simBinaryAnn(spark, sfDir))
    // The 8 branches are INDEPENDENT evaluations (each reads only the
    // pinned brute relation + its own method's plan), and the single
    // fused union executed them as one mostly-serial chain of AQE
    // stage materializations (r18 stage profile: 61 stage jobs,
    // 14.3 s in one execution). Overlap them from a small driver
    // thread pool (guide §2.6 — actions are only sequential because
    // the driver calls them sequentially): each branch materializes
    // via its own localCheckpoint, later branches back-fill the
    // earlier ones' straggler tails. Result rows are identical; only
    // job overlap changes. 3 in flight is the guide's "enough to fill
    // the tail" sizing.
    val parts = graft.core.Overlap.run(spark, "simRecallEval", 3)(
      methods.map { case (name, df) =>
        () => recallOf(name, df).localCheckpoint()
      })
    // checkpointed parts are query-set-sized; the union is metadata
    try parts.reduce(_ union _) finally brute.unpersist()
  }

  /** Near-dup threshold calibration sweep — the audit that PICKS the
    * cosine threshold before a SemDeDup-style dedup run (every
    * published pipeline sweeps this curve; Abbas et al. 2023 §4):
    * the distribution of within-cell pair cosines in 500-bp buckets,
    * with the cumulative "pairs you would merge at ≥ this threshold"
    * count alongside. Within-CELL deliberately: it profiles exactly
    * the candidate mass the blocked dedup operators
    * ([[graft.dedup.Dedup.dedupEmbed]] / `dedup_semantic`) will see.
    *
    * Scale notes (100 TB): pair generation is the packed-cell
    * `CellSimPairs` generator (Σ|cell|² arithmetic in memory, no
    * pair-payload shuffle) with the SAME floor the dedup ops use, the
    * histogram shuffle carries ≤ 19 bucket rows, and the cumulative
    * window runs over the bucket DOMAIN — the one scale-safe global
    * window shape (the `q_quantile_buckets` argument). Exact:
    * cosines round to 4 decimals before integer bucketing, so the
    * DuckDB oracle replays every bucket boundary bit-for-bit.
    */
  def simThresholdSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"bucket_lo_bp".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .groupBy($"label")
      .agg(collect_list(struct($"vec_id", $"v")).as("vecs"))
      .select(graft.functions.cellSimPairs($"vecs", 0.10 - 1e-4)
        .as(Seq("vec_id_1", "vec_id_2", "cos")))
      .filter(round($"cos", 4) >= 0.10)
      .withColumn("cos_bp",
        expr("cast(round(round(cos, 4) * 10000, 0) as bigint)"))
      .withColumn("bucket_lo_bp", expr("(cos_bp div 500) * 500"))
      .groupBy($"bucket_lo_bp")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_ge", sum($"n_pairs").over(w).cast("long"))
  }

  /** Integer fixed-point Lloyd's k-means over the embedding corpus —
    * the COARSE-QUANTIZER TRAINING step the IVF family assumes (the
    * `label` column stands in as a pre-trained quantizer elsewhere;
    * this operator is how that quantizer gets trained in the first
    * place, the `kmeans` of FAISS `IVFx`). Vectors are quantized once
    * to integer e6 components (`round(1e6·x)` — the float enters
    * exactly once per component), seeds are the k smallest vec_ids,
    * and each of the 3 Lloyd rounds (a) assigns every vector to its
    * strictly nearest centroid in exact int64 squared-L2 (ties to the
    * lowest centroid id) via the native [[graft.functions.nearestCentroid]]
    * tight-loop expression — a ZERO-SHUFFLE projection, the centroid
    * table rides the expression — and (b) recomputes centroids as
    * per-dimension `sum div count` (truncated division, exact
    * integers; empty clusters keep their previous centroid). The
    * output is the final assignment: one row per vector with its
    * cluster and exact squared distance.
    *
    * Scale notes (100 TB): the classic distributed Lloyd shape (what
    * MLlib's KMeans runs): per round, one linear scan assigns (no
    * shuffle — k·dims centroid longs are expression state), and the
    * update shuffles only map-side-combined per-(cluster, dim)
    * partial sums — ≤ partitions·k·dims rows, corpus-size-independent.
    * The k·dims driver collect per round is MODEL state (512 longs),
    * the same metadata-sized exception as EventLog's offset read.
    * Every quantity is exact int64, so the full 3-round trajectory is
    * replayed bit-for-bit by the DuckDB oracle (materialized rounds,
    * the [[graft.graph.Graph.graphPagerank]] recipe).
    */
  def simKmeans(spark: SparkSession, sfDir: String): DataFrame =
    simKmeans(spark, sfDir, k = 8, iters = 3)

  def simKmeans(spark: SparkSession, sfDir: String, k: Int,
                iters: Int): DataFrame = {
    import spark.implicits._
    val iv = vectors(spark, sfDir)
      .withColumn("iv", expr(
        "transform(v, x -> cast(round(1000000 * x, 0) as bigint))"))
      .select($"vec_id", $"iv")
      .persist()
    var cents: Seq[Seq[Long]] = iv.filter($"vec_id" < k)
      .orderBy($"vec_id").collect()
      .map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    for (_ <- 1 to iters) {
      val sums = iv
        .withColumn("cluster",
          graft.functions.nearestCentroid($"iv", cents)("cluster"))
        .select($"cluster", posexplode($"iv").as(Seq("dim", "x")))
        .groupBy($"cluster", $"dim")
        .agg(expr("sum(x) div count(1)").as("m"))
        .collect()
      val next = cents.map(_.toArray).toArray
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      cents = next.map(_.toIndexedSeq).toIndexedSeq
    }
    iv.withColumn("a", graft.functions.nearestCentroid($"iv", cents))
      .select($"vec_id", $"a.cluster".as("cluster"),
              $"a.dist".as("dist_e12"))
  }

  // ---------------------------------------------------------------
  // Graph-traversal ANN — NSW greedy beam search (Malkov et al.,
  // "Approximate nearest neighbor algorithm based on navigable small
  // world graphs", Inf. Systems 2014; the flat ancestor of HNSW).
  // Completes the index-family matrix: quantization schemes scan
  // compressed codes, the graph index NAVIGATES — per query it
  // touches O(hops · beam · degree) vectors, not a cell scan.
  // ---------------------------------------------------------------

  /** Directed kNN adjacency — each vector's exact top-5 cosine
    * neighbors within its coarse cell, the NSW base graph (the same
    * packed-cell generator as [[simKnnGraph]]; degree ≤ 5 BY
    * CONSTRUCTION, so a beam expansion is bounded). Source label
    * carried for the stored artifact's cell-clustered compaction.
    */
  private[graft] def knnEdges(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    // ONE packed-cell pass (r18 verdict item 6): the top-5 edges, the
    // 2-successor hash ring, and the union's dedup all come out of a
    // single generator over the packed cell. The pre-r19 shape paid a
    // second corpus scan + per-cell window sort for the ring and a
    // third exchange for the union's `distinct()`; the fused
    // generator sorts each cell in memory (the same cost class as the
    // pack) and dedups per member (edges never cross cells, so
    // per-member dedup IS the global distinct).
    vecs.withColumn("h", expr(
        "graft_md5lower64(cast(vec_id as string)) & 9223372036854775807"))
      .groupBy($"label")
      .agg(collect_list(struct($"vec_id", $"v", $"h")).as("cell"))
      .select($"label", graft.functions.cellKnnRing($"cell", 5)
        .as(Seq("vec_id", "neighbor_id")))
      .select($"vec_id", $"label", $"neighbor_id")
  }

  /** Deterministic LONG links: each vector links to the next 2
    * vectors in 63-bit-md5-hash order within its cell — a fixed
    * pseudo-random ring that gives the cell graph an expander
    * backbone. A pure kNN graph traps greedy search inside
    * near-duplicate cliques (every out-edge points back into the
    * clique); NSW gets its long links from random insertion order
    * (Malkov et al. §4 — early inserts link across the space), and
    * the hash ring is the deterministic, oracle-replayable analog
    * (measured on the sf0.1 corpus at W=48/H=8/E=4: recall@5 0.34
    * without the ring → 0.66 with it, vs IVF-5probe 0.54; the spec
    * pins NSW ≥ IVF). Per-cell window over (hash, id) — cell-sized
    * sorts, the same cost class as the packed-cell generator.
    */
  // Retained as the spec's UNFUSED twin: DedupSimSpec pins set
  // equality of [[knnEdges]]' fused generator against the original
  // window formulation (cellTopK ∪ ringEdges ∪ distinct) on the real
  // corpus.
  private[graft] def ringEdges(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"h", $"vec_id")
    val h = vecs.withColumn("h", expr(
        "graft_md5lower64(cast(vec_id as string)) & 9223372036854775807"))
      .select($"label", $"vec_id", $"h")
    h.withColumn("n1", lead($"vec_id", 1).over(w))
      .withColumn("n2", lead($"vec_id", 2).over(w))
      .select($"vec_id", $"label",
        explode(array($"n1", $"n2")).as("neighbor_id"))
      .filter($"neighbor_id".isNotNull)
  }

  /** Deterministic entry points, one per cell: the live vector with
    * the smallest 63-bit md5 of its id — a fixed pseudo-random pick
    * both engines compute identically (no RNG state), recomputed
    * from the LIVE vector set so a deleted entry can never strand
    * its cell.
    */
  private[graft] def nswEntries(vecs: DataFrame,
                                perCell: Int = 4): DataFrame = {
    import vecs.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"h", $"vec_id")
    vecs.withColumn("h", expr(
        "graft_md5lower64(cast(vec_id as string)) & 9223372036854775807"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= perCell)
      .select($"vec_id")
  }

  /** Batch-synchronous greedy beam search: seed each query's beam
    * with the per-cell entry points, then for a FIXED number of hops
    * expand the beam along the kNN edges, exact-cosine-score only the
    * NOT-YET-SEEN candidates, and keep the best `beamWidth` per query
    * (ties by vec_id — the [[graft.functions.TopK]] contract, so the
    * DuckDB oracle replays the traversal as one generated MATERIALIZED
    * CTE stage per hop, the BPE/coreness technique).
    *
    * Scale (100 TB): every hop is (a) an edge expansion bounded by
    * |queries|·beam·degree with the beam BROADCAST against the pinned
    * edge relation, and (b) an exact scoring join bounded by the new
    * candidates, again broadcast against the pinned vector store — the
    * corpus is never on the shuffled side, and ALL queries advance one
    * hop per pass, so the total cost is `hops` passes over cached
    * relations regardless of query-batch size. The per-hop
    * localCheckpoint keeps the plan constant (the iterative-fixpoint
    * convention); hop count is a constant, not data-dependent.
    */
  private[graft] def nswSearch(vecs: DataFrame, edges: DataFrame,
      entries: DataFrame, queries: DataFrame, excludeSelf: Boolean,
      beamWidth: Int = 48, hops: Int = 8, kOut: Int = 10): DataFrame = {
    import vecs.sparkSession.implicits._
    // The query set is CHECKPOINTED once (r18: kills the per-hop
    // re-evaluation of a corpus-derived query plan) and re-broadcast
    // into each hop's scoring join. r18 briefly carried qv on the
    // beam instead to delete that per-hop broadcast, but the beam
    // then dragged dim-sized arrays through every per-hop topW
    // exchange plus max(qv) array comparisons per group — the
    // committed sf1/sf10 legs read +40-60% on both nsw keys (r18
    // verdict item 1), a local-mode trade that loses in the
    // data-bound regime. REVERTED to the checkpointed-broadcast
    // shape; the r19 A/B traces adjudicate it.
    val q = queries.select(col("query_id"), col("qv")).localCheckpoint()
    def score(cands: DataFrame): DataFrame = {
      val s = vecs.select($"vec_id", $"v")
        .join(broadcast(cands), Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .select($"query_id", $"vec_id", cosineSim($"qv", $"v").as("cos"))
      if (excludeSelf) s.filter($"query_id" =!= $"vec_id") else s
    }
    def topW(c: DataFrame, w: Int): DataFrame =
      c.groupBy($"query_id")
        .agg(graft.functions.TopK.topK(w)($"vec_id", $"cos").as("top"))
        .select($"query_id", posexplode($"top").as(Seq("i", "p")))
        .select($"query_id", $"p._1".as("vec_id"), $"p._2".as("cos"),
                ($"i" + 1).cast("int").as("rank"))
    // NSW links are UNDIRECTED (Malkov et al. §3): symmetrize the
    // stored directed kNN edges at search time — the in-edges of a
    // near-neighbor hub are exactly the paths greedy search needs to
    // climb into it
    val und = edges.select($"vec_id", $"neighbor_id")
      .unionByName(edges.select($"neighbor_id".as("vec_id"),
        $"vec_id".as("neighbor_id")))
      .distinct().persist()
    val seeds = q.select($"query_id").crossJoin(broadcast(entries))
    var beam = topW(score(seeds), beamWidth)
      .select($"query_id", $"vec_id", $"cos").localCheckpoint()
    for (_ <- 1 to hops) {
      // FUSED frontier dedup + not-yet-seen anti-join (r18 job
      // profile: distinct + left_anti were two exchanges per hop on a
      // beam-bounded relation): tag expansion rows 0 and beam rows 1,
      // one (query, vec) aggregate keeps expansion rows only where no
      // beam row exists — exactly distinct-minus-beam, one exchange
      val expanded = und
        .join(broadcast(beam.select($"query_id", $"vec_id")),
          Seq("vec_id"))
        .select($"query_id", $"neighbor_id".as("vec_id"),
                lit(0).as("inb"))
      val fresh = expanded
        .unionByName(beam.select($"query_id", $"vec_id",
          lit(1).as("inb")))
        .groupBy($"query_id", $"vec_id")
        .agg(max($"inb").as("inb"))
        .filter($"inb" === 0)
        .select($"query_id", $"vec_id")
      beam = topW(beam.select($"query_id", $"vec_id", $"cos")
          .unionByName(score(fresh)), beamWidth)
        .select($"query_id", $"vec_id", $"cos").localCheckpoint()
    }
    und.unpersist()
    // final ranking reads only the checkpointed beam — safe to return
    // lazily after the caller unpins the corpus relations
    topW(beam, kOut)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
              round($"cos", 4).as("cosine"))
  }

  def simNswAnn(spark: SparkSession, sfDir: String): DataFrame =
    simNswAnn(spark, sfDir, defaultQueries(spark, sfDir),
      excludeSelf = true)

  /** NSW ANN, recompute form: build the kNN graph + entry points
    * inline, then beam-search. The stored twin
    * ([[AnnIndex.simNswStored]]) answers the same queries from the
    * persisted graph artifacts alone.
    */
  def simNswAnn(spark: SparkSession, sfDir: String, queries: DataFrame,
                excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val vecs = vectors(spark, sfDir).persist()
    try {
      val edges = knnEdges(vecs).persist()
      // the per-hop checkpoints materialize inside nswSearch, so both
      // corpus-sized pins release before returning
      try nswSearch(vecs, edges, nswEntries(vecs), queries, excludeSelf)
        .localCheckpoint()
      finally { edges.unpersist(); () }
    } finally { vecs.unpersist(); () }
  }
}
