package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deduplication operators over the `documents` table: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine.
  *
  * Scale notes (100 TB): no operator does an unblocked n² comparison.
  * Candidate pairs always come from an equi-join on a blocking key
  * (content hash, LSH band hash, SimHash chunk, source bucket, label
  * bucket), so the only wide operation is a shuffle on that key and
  * the quadratic work is confined to within-bucket verification.
  */
object Dedup {

  /** Exact dedup: md5 over normalized text as the content key, keep
    * the lowest doc_id per group. One shuffle on the hash.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("content_hash", md5(lower(trim($"text"))))
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_doc_id"),
           count(lit(1)).as("n_docs"))
  }

  private def withWordSet(df: DataFrame): DataFrame =
    df.withColumn("wset", expr("array_distinct(split(trim(text), ' +'))"))

  /** Exact word-set Jaccard near-dup pairs (τ ≥ 0.9), blocked by
    * `source`. The oracle-checkable exact variant; [[dedupMinhash]]
    * is the scalable approximation of the same predicate.
    */
  def dedupNgram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = withWordSet(Tables.documents(spark, sfDir))
      .select($"doc_id", $"source", $"wset")
    val a = d.select($"source", $"doc_id".as("doc_id_1"), $"wset".as("w1"))
    val b = d.select($"source", $"doc_id".as("doc_id_2"), $"wset".as("w2"))
    a.join(b, Seq("source"))
      .filter($"doc_id_1" < $"doc_id_2")
      .withColumn("jaccard",
        expr("cast(size(array_intersect(w1, w2)) as double)") /
        expr("size(array_distinct(concat(w1, w2)))"))
      .filter($"jaccard" >= 0.9)
      .select($"doc_id_1", $"doc_id_2", round($"jaccard", 4).as("jaccard"))
  }

  /** MinHash + LSH near-dup detection (Broder '97 / MMDS ch.3 shape):
    * 64 hash functions, 16 bands × 4 rows. Candidates = pairs sharing
    * any band hash; verified with exact Jaccard ≥ 0.8. At scale the
    * band-hash shuffle is the only wide op and bucket sizes stay
    * bounded because identical band hashes imply near-identical docs.
    */
  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = withWordSet(Tables.documents(spark, sfDir))
      // sig[i] = min over words of xxhash64(word, salt=i)
      .withColumn("sig",
        expr("transform(sequence(0, 63), i -> " +
             "array_min(transform(wset, w -> xxhash64(w, i))))"))
      // band hash over each run of 4 signature slots
      .withColumn("bands",
        expr("transform(sequence(0, 15), b -> " +
             "xxhash64(concat_ws(',', slice(sig, b*4+1, 4))))"))
      .select($"doc_id", $"wset", posexplode($"bands").as(Seq("band_idx", "band_hash")))
    val a = d.select($"band_idx", $"band_hash", $"doc_id".as("doc_id_1"), $"wset".as("w1"))
    val b = d.select($"band_idx", $"band_hash", $"doc_id".as("doc_id_2"), $"wset".as("w2"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter($"doc_id_1" < $"doc_id_2")
      .select($"doc_id_1", $"doc_id_2", $"w1", $"w2").distinct()
      .withColumn("jaccard",
        expr("cast(size(array_intersect(w1, w2)) as double)") /
        expr("size(array_distinct(concat(w1, w2)))"))
      .filter($"jaccard" >= 0.8)
      .select($"doc_id_1", $"doc_id_2", round($"jaccard", 4).as("jaccard"))
  }

  /** 64-bit SimHash (Charikar '02 / Manku et al. WWW'07 shape): each
    * word votes ±1 per bit of its hash; the sign vector packs into a
    * long. Near-dups = hamming distance ≤ 3, found by the pigeonhole
    * block trick: split the 64 bits into 4×16-bit chunks — distance
    * ≤ 3 implies at least one chunk matches exactly, so candidates
    * come from 4 equi-joins on (chunk_idx, chunk_value), never n².
    */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = withWordSet(Tables.documents(spark, sfDir))
      .withColumn("simhash",
        expr("aggregate(sequence(0, 63), 0L, (acc, i) -> acc + " +
             "if(aggregate(wset, 0L, (s, w) -> s + " +
             "if(((xxhash64(w) >> i) & 1L) = 1L, 1L, -1L)) > 0L, " +
             "shiftleft(1L, i), 0L))"))
      .withColumn("chunks",
        expr("transform(sequence(0, 3), c -> (simhash >> (c*16)) & 65535L)"))
      .select($"doc_id", $"simhash", posexplode($"chunks").as(Seq("chunk_idx", "chunk_val")))
    val a = d.select($"chunk_idx", $"chunk_val", $"doc_id".as("doc_id_1"), $"simhash".as("h1"))
    val b = d.select($"chunk_idx", $"chunk_val", $"doc_id".as("doc_id_2"), $"simhash".as("h2"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter($"doc_id_1" < $"doc_id_2")
      .select($"doc_id_1", $"doc_id_2", $"h1", $"h2").distinct()
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter($"hamming" <= 3)
      .select($"doc_id_1", $"doc_id_2", $"hamming")
  }

  /** Embedding-cosine near-dup pairs (cos ≥ 0.35), blocked by the
    * `label` cluster id. Dot products via zip_with/aggregate in
    * doubles — same accumulation order as the DuckDB oracle.
    */
  def dedupEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .select($"vec_id", $"label", $"v")
    val a = e.select($"label", $"vec_id".as("vec_id_1"), $"v".as("v1"))
    val b = e.select($"label", $"vec_id".as("vec_id_2"), $"v".as("v2"))
    a.join(b, Seq("label"))
      .filter($"vec_id_1" < $"vec_id_2")
      .withColumn("cos", graft.functions.cosineSim($"v1", $"v2"))
      .filter(round($"cos", 4) >= 0.35)
      .select($"vec_id_1", $"vec_id_2", round($"cos", 4).as("cosine"))
  }
}
