package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Iterative graph algorithms over similarity edges — the family the
  * dedup pipeline's connected components belong to, exposed as its
  * own operator instead of being buried inside minhash.
  *
  * Scale design (100 TB): the classic Spark iterative-CC loop —
  * pin the (symmetric) edge relation once, then repeat
  * label ← min(label, min(neighbor label)) until a fixpoint. Each
  * hop is two shuffles (edge⋈label join + per-node min) over data
  * partitioned by node id; `localCheckpoint` cuts the lineage per
  * hop so plan size stays constant no matter how many hops a deep
  * component needs. Near-dup graphs converge in a handful of hops
  * (components are dup clusters, whose diameter is small); the hop
  * cap is a runaway guard, not a correctness bound — the loop exits
  * on the converged-count, and a cap hit raises rather than
  * returning a half-propagated labeling.
  */
object Graph {

  /** Near-dup edges: the [[graft.dedup.Dedup.dedupEmbed]] predicate
    * (label-blocked cosine ≥ 0.35), symmetrized.
    */
  private def nearDupEdges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = graft.dedup.Dedup.dedupEmbed(spark, sfDir)
      .select($"vec_id_1".as("a"), $"vec_id_2".as("b"))
    p.union(p.select($"b".as("a"), $"a".as("b")))
  }

  /** Exact connected components of the embedding near-dup graph:
    * every vector labeled with the smallest vec_id reachable through
    * near-dup edges (isolated vectors label themselves). The
    * deterministic min-id representative is what makes an iterative
    * distributed algorithm oracle-checkable at all.
    */
  def graphComponents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val edges = nearDupEdges(spark, sfDir).persist()
    // Only edge ENDPOINTS iterate — an isolated node's label never
    // moves, so keeping it in the loop would drag the whole corpus
    // through every hop when the connected part is a tiny fraction
    // (near-dup graphs at corpus scale: most docs are unique).
    // Symmetrized edges mean the `a` side alone covers all endpoints.
    var labels = edges.select($"a".as("vec_id")).distinct()
      .withColumn("comp", $"vec_id")
      .localCheckpoint()
    try {
      var converged = false
      var hops = 0
      while (!converged) {
        assert(hops < 50, "component diameter exceeded the hop guard")
        val nbrMin = edges
          .join(labels.select($"vec_id".as("b"), $"comp".as("nbr_comp")), Seq("b"))
          .groupBy($"a").agg(min($"nbr_comp").as("nbr_comp"))
        // inner join: every active node has ≥1 neighbor by construction;
        // the changed flag rides the same pass, so convergence costs no
        // extra join against the previous labeling
        val next = labels
          .join(nbrMin.select($"a".as("vec_id"), $"nbr_comp"), Seq("vec_id"))
          .select($"vec_id", least($"comp", $"nbr_comp").as("comp"),
                  ($"nbr_comp" < $"comp").as("changed"))
          .localCheckpoint() // cut lineage: constant plan size per hop
        converged = next.filter($"changed").isEmpty
        labels = next.drop("changed")
        hops += 1
      }
      // isolated nodes rejoin as their own components on the way out
      Tables.embeddings(spark, sfDir).select($"vec_id")
        .join(labels, Seq("vec_id"), "left_outer")
        .select($"vec_id", coalesce($"comp", $"vec_id").as("component"))
    } finally edges.unpersist()
  }

  /** Per-node triangle counts in the similarity graph (τ = 0.2 keeps
    * the graph dense enough to have triangles at every test SF).
    * Standard distributed triangle enumeration: edges oriented
    * low-id → high-id, so each triangle (a<b<c) is produced exactly
    * once by joining wedge (a,b)+(b,c) against closing edge (a,c) —
    * no symmetric blowup, work bounded by Σ wedge counts of the
    * min-id endpoint (the orientation trick that makes this feasible
    * on skewed degree distributions). Pure integer counting — exact
    * on any engine.
    *
    * Edge generation is within-label all-pairs, so it carries the
    * same quantizer contract as [[graft.similarity.Similarity.simKnnGraph]]:
    * at 100 TB the `label` column stands in for a coarse quantizer
    * trained with k ∝ √N cells, bounding the Σ|cell|² edge work at
    * ≈ N^1.5 — never corpus².
    */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // packed-cell pair generation (see CellSimPairs Scaladoc): one
    // corpus shuffle + in-memory scoring replaces the vector-payload
    // pair join; exact rounded predicate re-applied on the output
    val edges = Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .groupBy($"label")
      .agg(collect_list(struct($"vec_id", $"v")).as("vecs"))
      .select(graft.functions.cellSimPairs($"vecs", 0.2 - 1e-4)
        .as(Seq("ea", "eb", "c")))
      .filter(round($"c", 4) >= 0.2)
      .select($"ea", $"eb")
      .persist()
    try {
      val tri = edges.select($"ea".as("x"), $"eb".as("y"))
        .join(edges.select($"ea".as("y"), $"eb".as("z")), Seq("y"))
        .join(edges.select($"ea".as("x"), $"eb".as("z")), Seq("x", "z"))
        .select($"x", $"y", $"z")
      val out = tri
        .select(explode(array($"x", $"y", $"z")).as("vec_id"))
        .groupBy($"vec_id")
        .agg(count(lit(1)).as("n_triangles"))
      // count() inside the try: materialize while the edge relation
      // is still pinned, then hand back the small per-node result
      out.localCheckpoint()
    } finally edges.unpersist()
  }
}
