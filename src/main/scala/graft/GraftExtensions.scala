package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{BpeCount, WindowMin, CellSimPairs, CellTopK, CodepointSum, PunctCount, CosineSimilarity, Phash63, ShingleMd5, HyperplaneBuckets, Md5Lower64, MinHashBands, MinHashSigMd5, SimHash64, SimHash64Md5, SortedJaccard, TopKLong, TopKString}

/** SparkSessionExtensions installer: exposes graft's native Catalyst
  * expressions to SQL. Register with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * SQL surface:
  *   graft_cosine(array<double>, array<double>) → double
  *   graft_simhash64(array<long>)               → bigint
  *   graft_minhash_bands(array<string>, bands, rows) → array<bigint>
  *   graft_sorted_jaccard(array<string>, array<string>) → double
  *   graft_hyperplane_buckets(array<double>, tables, bits) → array<bigint>
  *   graft_md5lower64(string)                   → bigint
  *   graft_codepoint_sum(string)                → bigint
  *   graft_phash63(string)                      → bigint
  *   graft_shingle_md5(array<string>, n)        → array<bigint>
  *   graft_topk(id bigint, score double, k)     → array<struct<_1,_2>> (aggregate)
  *   graft_topk_str(id string, score double, k) → array<struct<_1,_2>> (aggregate)
  *   graft_cell_topk(array<struct<id,vec>>, k)  → rows (generator)
  *   graft_cell_sim_pairs(array<struct<id,vec>>, minCos) → rows (generator)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthPruning)
    // whole-operator extension: the native as-of join's planner strategy
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoin.Strategy)
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (es: Seq[Expression]) => MinHashBands(es.head,
        intArg(es(1), "numBands"), intArg(es(2), "rowsPerBand"))))
    ext.injectFunction((FunctionIdentifier("graft_sorted_jaccard"),
      new ExpressionInfo(classOf[SortedJaccard].getName, "graft_sorted_jaccard"),
      (es: Seq[Expression]) => SortedJaccard(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_buckets"),
      (es: Seq[Expression]) => HyperplaneBuckets(es.head,
        intArg(es(1), "tables"), intArg(es(2), "bits"), 64)))
    ext.injectFunction((FunctionIdentifier("graft_simhash64_md5"),
      new ExpressionInfo(classOf[SimHash64Md5].getName, "graft_simhash64_md5"),
      (es: Seq[Expression]) => SimHash64Md5(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigMd5].getName, "graft_minhash_sig"),
      (es: Seq[Expression]) => MinHashSigMd5(es.head, intArg(es(1), "slots"))))
    ext.injectFunction((FunctionIdentifier("graft_md5lower64"),
      new ExpressionInfo(classOf[Md5Lower64].getName, "graft_md5lower64"),
      (es: Seq[Expression]) => Md5Lower64(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_codepoint_sum"),
      new ExpressionInfo(classOf[CodepointSum].getName, "graft_codepoint_sum"),
      (es: Seq[Expression]) => CodepointSum(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_punct_count"),
      new ExpressionInfo(classOf[PunctCount].getName, "graft_punct_count"),
      (es: Seq[Expression]) => PunctCount(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "graft_bpe_count"),
      (es: Seq[Expression]) => BpeCount(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_window_min"),
      new ExpressionInfo(classOf[WindowMin].getName, "graft_window_min"),
      (es: Seq[Expression]) => WindowMin(es.head, intArg(es(1), "w"))))
    ext.injectFunction((FunctionIdentifier("graft_phash63"),
      new ExpressionInfo(classOf[Phash63].getName, "graft_phash63"),
      (es: Seq[Expression]) => Phash63(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_md5"),
      new ExpressionInfo(classOf[ShingleMd5].getName, "graft_shingle_md5"),
      (es: Seq[Expression]) => ShingleMd5(es.head, intArg(es(1), "n"))))
    ext.injectFunction((FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKLong].getName, "graft_topk"),
      (es: Seq[Expression]) => TopKLong(es.head, es(1), intArg(es(2), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_topk_str"),
      new ExpressionInfo(classOf[TopKString].getName, "graft_topk_str"),
      (es: Seq[Expression]) => TopKString(es.head, es(1), intArg(es(2), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_cell_topk"),
      new ExpressionInfo(classOf[CellTopK].getName, "graft_cell_topk"),
      (es: Seq[Expression]) => CellTopK(es.head, intArg(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_cell_sim_pairs"),
      new ExpressionInfo(classOf[CellSimPairs].getName, "graft_cell_sim_pairs"),
      (es: Seq[Expression]) => CellSimPairs(es.head, doubleArg(es(1), "minCos"))))
  }

  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Number, _) => v.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }
}
