package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Data-layout operators for the training-data store: Z-order
  * (Morton) clustering keys and zero-shuffle weighted mixture
  * interleaving. Both emit deterministic per-document keys — the
  * layout itself (range-partition + sort by the key at write time)
  * is a property of the writer, demonstrated in LayoutSpec; the
  * keys are what the oracle can replay bit-for-bit.
  */
object Layout {

  /** 16-bit Morton spread: interleave zeros between the bits of a
    * value in [0, 65535], expressed purely in built-in bitwise
    * functions so the whole key stays inside whole-stage codegen and
    * an external SQL engine can replay it with `<<`/`|`/`&`.
    */
  private def spread16(c: String): String = {
    val s1 = s"((($c) | shiftleft(($c), 8)) & 16711935)"      // 0x00FF00FF
    val s2 = s"((($s1) | shiftleft(($s1), 4)) & 252645135)"   // 0x0F0F0F0F
    val s3 = s"((($s2) | shiftleft(($s2), 2)) & 858993459)"   // 0x33333333
    s"((($s3) | shiftleft(($s3), 1)) & 1431655765)"           // 0x55555555
  }

  /** Z-order (Morton) clustering key over two dimensions a training
    * store actually range-filters on — language (hashed to a 16-bit
    * code) and document length (clipped to 16 bits) — plus the
    * coarse file bucket (`zkey div 2^18`) a writer would range-
    * partition on.
    *
    * Why at 100 TB: sorting by a single column gives perfect min/max
    * file pruning on that column and none on any other. The Morton
    * key interleaves the bits of BOTH dimensions, so consecutive key
    * ranges are small rectangles in (lang, length) space and every
    * file's min/max stats stay narrow on both columns — a
    * `lang = X AND n_chars BETWEEN a AND b` scan prunes most files
    * on stats alone (the Delta/Iceberg `OPTIMIZE ZORDER` layout).
    * The key is a per-row projection: zero shuffles to compute, one
    * range-partitioned sort to apply at write time. LayoutSpec
    * measures the pruning: per-file dimension ranges under Z-order
    * vs a single-column sort.
    */
  def pipelineZorder(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("lang_code", expr(
        "(graft_md5lower64(lang) & 9223372036854775807) % 65536"))
      .withColumn("len_clip", least($"n_chars", lit(65535L)))
      .withColumn("zkey", expr(
        s"${spread16("lang_code")} | shiftleft(${spread16("len_clip")}, 1)"))
      .select($"doc_id", $"lang_code", $"len_clip", $"zkey",
              expr("zkey div 262144").as("zbucket"))
  }

  /** Weighted mixture interleave as a PURE PROJECTION — the order in
    * which a training run should consume documents so that every
    * prefix of the stream realizes the configured source mixture
    * (40/25/20/10/5% here), without any window or global
    * coordination.
    *
    * Each doc gets `mix_pos = h * stride(source)` where `h` is a
    * 32-bit md5 of the doc id (salted, so the decision is independent
    * of the sample/split/shard hashes). Docs of source s land
    * uniformly on the position axis with density n_s / stride_s, so
    * the stride must fold in the source's OBSERVED size:
    * `stride_s = (10^7 · n_s) div (wbp_s · N)` (integer arithmetic,
    * exact on both engines) makes any prefix [0, T) carry the
    * sources in wbp proportion REGARDLESS of source skew — the
    * stride-scheduling invariant, asserted in LayoutSpec. The sizes
    * come from one 5-row map-side-partial aggregate; max position
    * 2^32 · stride < 2^63 at any realistic skew.
    *
    * The mixture spec NAMES its sources: documents from sources not
    * in the weight table are excluded (the stride join is inner) —
    * a training mixture is a curated allowlist, not a default-rate
    * catch-all (that role belongs to [[Analytics.pipelineSample]]).
    *
    * Why at 100 TB: the obvious formulation (per-source row_number,
    * then merge by rank/weight) needs one single-reducer window PER
    * SOURCE — a 40 TB source funnels through one task. This one is
    * embarrassingly parallel: the position is a scan-pass projection
    * (the stride table is a broadcast literal), the writer
    * range-partitions by it, and re-weighting only changes the
    * 5-row table.
    */
  def pipelineMixture(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wbp = Map( // target weights in basis points of 10^4
      "src0" -> 4000L, "src1" -> 2500L, "src2" -> 2000L,
      "src3" -> 1000L, "src4" -> 500L)
    val docs = Tables.documents(spark, sfDir)
    // size normalization counts only the sources IN the mixture
    val counts = docs.filter($"source".isInCollection(wbp.keys.toSeq))
      .groupBy($"source").agg(count(lit(1)).as("ns"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = counts.map(_._2).sum
    require(total > 0, "no documents from any source in the mixture spec")
    val strides = spark.createDataFrame(
      counts.toSeq.flatMap { case (s, ns) =>
        wbp.get(s).map(w => (s, (10000000L * ns) / (w * total))) })
      .toDF("s_source", "stride")
    docs
      .withColumn("h", expr(
        "graft_md5lower64(concat('mix:', cast(doc_id as string))) " +
          "& 4294967295"))
      .join(broadcast(strides), $"source" === $"s_source")
      .withColumn("mix_pos", $"h" * $"stride")
      .select($"doc_id", $"source", $"mix_pos")
  }
}
