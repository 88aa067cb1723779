package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the dedup / similarity /
  * text operators. All are pure `functions._` compositions (JVM
  * higher-order functions — no Scala UDF serialization, no Python),
  * so they inline into Catalyst plans and stay partition-local.
  */
package object functions {

  import org.apache.spark.sql.graft.{BitsToMask, Bridge, CellKnnRing, CellSimPairs, CellTopK, CodepointSum, Phash63, ShingleMd5, CosineSimilarity, HyperplaneBuckets, MaskJaccard, Md5Lower64, MinHashBands, MinHashSigMd5, SimHash64, SimHash64Md5, SortedJaccard}

  /** Cosine similarity between two `array<double>` columns — native
    * codegen'd Catalyst expression ([[CosineSimilarity]]) with
    * sequential accumulation, bit-identical to a scalar loop.
    */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** 64-bit SimHash over an `array<long>` of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokenHashes)))

  /** 64-bit SimHash straight from an `array<string>` token set —
    * md5-lower-64 digest + bit votes fused in one native loop
    * (oracle-replayable, no per-token lambda dispatch).
    */
  def simhash64Md5(tokens: Column): Column =
    Bridge.column(SimHash64Md5(Bridge.expression(tokens)))

  /** Jaccard similarity of two sorted, deduplicated string arrays. */
  def sortedJaccard(a: Column, b: Column): Column =
    Bridge.column(SortedJaccard(Bridge.expression(a), Bridge.expression(b)))

  /** Pack bit positions (`array<int>`) into a width-word `array<long>`
    * bitmask (small-vocabulary word-set encoding).
    */
  def bitsToMask(bits: Column, width: Int): Column =
    Bridge.column(BitsToMask(Bridge.expression(bits), width))

  /** Jaccard similarity of two equal-width `array<long>` bitmasks —
    * bit-identical to [[sortedJaccard]] on the same sets.
    */
  def maskJaccard(a: Column, b: Column): Column =
    Bridge.column(MaskJaccard(Bridge.expression(a), Bridge.expression(b)))

  /** MinHash LSH band hashes for an `array<string>` token set
    * (xxhash64 base pair — fastest, Spark-only bit pattern).
    */
  def minhashBands(tokens: Column, numBands: Int, rowsPerBand: Int): Column =
    Bridge.column(MinHashBands(Bridge.expression(tokens), numBands, rowsPerBand))

  /** MinHash signature (slot minima) with md5-derived base hashes —
    * bit-reproducible by an external SQL oracle (DuckDB
    * `md5_number_lower`/`md5_number_upper` + HUGEINT arithmetic).
    */
  def minhashSigMd5(tokens: Column, slots: Int): Column =
    Bridge.column(MinHashSigMd5(Bridge.expression(tokens), slots))

  /** Multi-table random-hyperplane LSH bucket ids for an
    * `array<double>` vector.
    */
  def hyperplaneBuckets(v: Column, tables: Int, bits: Int, dims: Int = 64): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(v), tables, bits, dims))

  /** Lower 64 bits of md5 (little-endian bytes 8..16) as a signed
    * long — same bit pattern as DuckDB's `md5_number_lower`.
    */
  def md5Lower64(s: Column): Column =
    Bridge.column(Md5Lower64(Bridge.expression(s)))

  /** Sum of Unicode code points of a string column. */
  def codepointSum(s: Column): Column =
    Bridge.column(CodepointSum(Bridge.expression(s)))

  /** 63-segment perceptual hash of a string (single-pass fused form
    * of the segment/codepoint-sum/threshold pipeline — see
    * [[org.apache.spark.sql.graft.Phash63]]).
    */
  def phash63(s: Column): Column =
    Bridge.column(Phash63(Bridge.expression(s)))

  /** 63-bit md5 of every word n-gram shingle (fused slice/concat/md5
    * pipeline — see [[org.apache.spark.sql.graft.ShingleMd5]]).
    */
  def shingleMd5(words: Column, n: Int): Column =
    Bridge.column(ShingleMd5(Bridge.expression(words), n))

  /** Dot product of two `array<double>` columns. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of an `array<double>` column. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Per-cell kNN generator: `cellTopK(array<struct<id, v>>, k)` →
    * rows (vec_id, neighbor_id, rank, cosine), each member's top-k
    * cosine neighbors within the packed cell. See
    * [[org.apache.spark.sql.graft.CellTopK]] for the shuffle-shape
    * rationale.
    */
  def cellTopK(vecs: Column, k: Int): Column =
    Bridge.column(CellTopK(Bridge.expression(vecs), k))

  /** Threshold twin of [[cellTopK]]: all within-cell pairs with raw
    * cosine ≥ minCos as (vec_id_1 < vec_id_2, cosine). Pass minCos
    * slightly below the rounded threshold and re-apply the exact
    * rounded predicate outside.
    */
  def cellSimPairs(vecs: Column, minCos: Double): Column =
    Bridge.column(CellSimPairs(Bridge.expression(vecs), minCos))

  /** Fused NSW base-graph generator:
    * `cellKnnRing(array<struct<id, v, h>>, k)` → rows
    * (vec_id, neighbor_id) = each member's top-k cosine neighbors
    * UNION its next-2 hash-ring successors in (h, id) order,
    * deduplicated — the one-pass packed form of
    * `cellTopK ∪ ringEdges ∪ distinct`. See
    * [[org.apache.spark.sql.graft.CellKnnRing]].
    */
  def cellKnnRing(vecs: Column, k: Int): Column =
    Bridge.column(CellKnnRing(Bridge.expression(vecs), k))

  /** Membership probe of a LongType column against a serialized
    * [[org.apache.spark.util.sketch.BloomFilter]] — the broadcast
    * runtime-filter primitive (see
    * [[org.apache.spark.sql.graft.BloomMightContain]]).
    */
  def bloomMightContain(sketchBytes: Array[Byte], value: Column): Column =
    Bridge.column(org.apache.spark.sql.graft.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(sketchBytes),
      Bridge.expression(value)))

  /** Nearest-centroid assignment of an `array<long>` vector against
    * a fixed centroid table (k-means Lloyd map step) →
    * `struct<cluster int, dist long>`. See
    * [[org.apache.spark.sql.graft.NearestCentroidL2]].
    */
  def nearestCentroid(v: Column, centroids: Seq[Seq[Long]]): Column =
    Bridge.column(org.apache.spark.sql.graft.NearestCentroidL2(
      Bridge.expression(v), centroids))
}
