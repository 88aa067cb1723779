package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: class-space bucket heat for the k-core design
  * (not part of the library surface).
  */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val bands = graft.dedup.Dedup
      .contentBands(graft.core.Tables.documents(spark, sfDir)).persist()
    val clsBands = bands
      .select($"band_idx", $"band_hash", $"sig_class".as("cls")).distinct()
      .persist()
    println(s"class-band rows: ${clsBands.count()}")
    val buckets = clsBands.groupBy($"band_idx", $"band_hash")
      .agg(count(lit(1)).as("c"))
    buckets.agg(max($"c").as("max_classes_per_bucket"),
                sum($"c" * ($"c" - 1)).as("pair_rows"),
                count(lit(1)).as("n_buckets")).show(false)
    buckets.orderBy($"c".desc).show(10, false)
    val nCls = bands.select($"sig_class").distinct().count()
    println(s"classes: $nCls")
    // band-PAIR bucket heat: cost of enumerating pairs that share >= 2
    // bands (the exact correction set for the bucket-mass algebra)
    val bp = clsBands.as("x")
      .join(clsBands.as("y"),
        $"x.cls" === $"y.cls" && $"x.band_idx" < $"y.band_idx")
      .select($"x.cls".as("cls"),
        $"x.band_idx".as("b1"), $"y.band_idx".as("b2"),
        $"x.band_hash".as("h1"), $"y.band_hash".as("h2"))
    val bpBuckets = bp.groupBy($"b1", $"b2", $"h1", $"h2")
      .agg(count(lit(1)).as("c"))
    bpBuckets.agg(max($"c").as("max_bp_bucket"),
                  sum($"c" * ($"c" - 1)).as("bp_pair_rows"),
                  count(lit(1)).as("n_bp_buckets")).show(false)
  }
}
