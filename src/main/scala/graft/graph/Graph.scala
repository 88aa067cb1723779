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
}
