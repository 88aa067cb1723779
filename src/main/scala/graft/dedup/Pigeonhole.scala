package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Manku et al. WWW'07 3-of-6 block-combination candidate
  * machinery for hamming-distance ≤ 3 pair search over a packed long
  * hash, shared by [[Dedup.dedupSimhash]] (64-bit simhash) and
  * [[graft.multimodal.Multimodal.mmPhashPairs]] (63-bit perceptual
  * hash): split the hash into 6 blocks; ≤ 3 flipped bits touch ≤ 3
  * blocks, so at least 3 of the 6 match exactly and some C(6,3)=20
  * combination of 3 whole blocks collides — candidates come from 20
  * equi-joins on (combo_id, packed 3-block key), never n².
  *
  * Why 3-block combo keys and not a simpler 1-of-4 single-block
  * pigeonhole: a 16-bit block key has only 65k buckets, so random
  * (non-dup) collisions grow birthday-quadratically (measured 27×
  * time at 10× data before the round-6 rewrite). A 3-block key is
  * 31+ bits wide, pushing the same birthday term below n²/2³², and
  * the guarantee stays EXACT for d ≤ 3 — more index rows (20/doc vs
  * 4/doc, still linear) for quadratically fewer spurious candidates.
  */
object Pigeonhole {

  /** A 6-block split of an `nbits`-wide long hash. Block widths must
    * be ≤ 21 so three block values pack disjointly into the 63-bit
    * combo key's 21-bit fields.
    */
  final case class Scheme(offs: Seq[Int], bits: Seq[Int]) {
    require(offs.size == 6 && bits.size == 6 && bits.forall(_ <= 21))

    val combos: Seq[Seq[Int]] = (0 until 6).combinations(3).toSeq

    private def block(h: Column, i: Int): Column =
      shiftright(h, offs(i)).bitwiseAND((1L << bits(i)) - 1)

    /** The 20 candidate keys of a hash as
      * `array<struct<combo_id int, key long>>` — key packs the 3
      * block values into fixed 21-bit fields (no overlap).
      */
    def comboKeys(h: Column): Column = array(combos.zipWithIndex.map {
      case (c, id) =>
        struct(lit(id).as("combo_id"),
          shiftleft(block(h, c(0)), 42).bitwiseOR(shiftleft(block(h, c(1)), 21))
            .bitwiseOR(block(h, c(2))).as("key"))
    }: _*)

    /** EXACTLY-ONCE emission without a pair-distinct: a hamming ≤ 3
      * pair matches one join row per 3-subset of its untouched
      * blocks (up to 20 for identical hashes), and a `.distinct()`
      * would shuffle all of those copies. A pair is instead emitted
      * only from its CANONICAL combo — the lexicographically
      * smallest 3-subset of the untouched set U, i.e. the row whose
      * combo (i&lt;j&lt;k) has no untouched block below k outside
      * {i,j}: untouchedMask & lowMask(combo) == 0, a per-row bitmask
      * test against a 20-entry literal table. The canonical combo's
      * blocks are untouched, so its join row always exists — nothing
      * is lost — and no other combo passes, so nothing duplicates.
      */
    def canonicalOnly(h1: Column, h2: Column, comboId: Column): Column = {
      val xorCol = h1.bitwiseXOR(h2)
      val untouchedMask = (0 until 6).map { b =>
        when(shiftright(xorCol, offs(b))
          .bitwiseAND((1L << bits(b)) - 1) === 0, 1 << b).otherwise(0)
      }.reduce(_ + _)
      val lowMasks = combos.map { c =>
        lit(((1 << c(2)) - 1) & ~(1 << c(0)) & ~(1 << c(1)))
      }
      untouchedMask
        .bitwiseAND(element_at(array(lowMasks: _*), comboId + 1)) === 0
    }

    /** The shared candidate-join/emit scaffold over a keyed relation
      * (doc_id, h, combo_id, key) — 20 equi-join rows per doc, pair
      * order (doc_id_1 < doc_id_2), cheap hamming verify BEFORE the
      * canonical-combo exactly-once filter. ONE definition so the two
      * consumers (dedup_simhash, mm_phash_pairs) cannot diverge in
      * emission discipline; the caller persists `keyed` when both
      * join sides would otherwise recompute an expensive hash.
      */
    def pairs(keyed: org.apache.spark.sql.DataFrame,
              maxHamming: Int): org.apache.spark.sql.DataFrame = {
      val a = keyed.select(col("combo_id"), col("key"),
        col("doc_id").as("doc_id_1"), col("h").as("h1"))
      val b = keyed.select(col("combo_id"), col("key"),
        col("doc_id").as("doc_id_2"), col("h").as("h2"))
      a.join(b, Seq("combo_id", "key"))
        .filter(col("doc_id_1") < col("doc_id_2"))
        .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
        .filter(col("hamming") <= maxHamming)
        .filter(canonicalOnly(col("h1"), col("h2"), col("combo_id")))
        .select(col("doc_id_1"), col("doc_id_2"), col("hamming"))
    }
  }

  /** 64-bit simhash split: (11,11,11,11,10,10). */
  val Sim64: Scheme = Scheme(Seq(0, 11, 22, 33, 44, 54),
                             Seq(11, 11, 11, 11, 10, 10))

  /** 63-bit perceptual-hash split: (11,11,11,10,10,10) — bit 63 is
    * never set (it would overflow a signed long), so 63 bits cover
    * the whole code.
    */
  val Hash63: Scheme = Scheme(Seq(0, 11, 22, 33, 43, 53),
                              Seq(11, 11, 11, 10, 10, 10))
}
