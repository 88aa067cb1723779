package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Pigeonhole
import graft.multimodal.Multimodal

/** The shared Manku 3-of-6 block-combination machinery (round-10
  * verdict item 4): the property both consumers (dedup_simhash's
  * 64-bit split, mm_phash_pairs' 63-bit split) rely on — every
  * hamming ≤ 3 pair shares at least one combo key (losslessness) and
  * EXACTLY one shared combo passes the canonical-emission filter
  * (exactly-once, no pair-distinct needed).
  */
class PigeonholeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def checkScheme(scheme: Pigeonhole.Scheme, nbits: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(nbits * 1000 + 7)
    // 400 pairs per distance d ∈ {0,1,2,3}: base hash random over the
    // full width, perturbed by flipping d DISTINCT bit positions
    val pairs = for {
      d <- 0 to 3
      i <- 0 until 400
    } yield {
      val h1 = rnd.nextLong() & (if (nbits == 64) -1L else (1L << nbits) - 1)
      val flips = rnd.shuffle((0 until nbits).toList).take(d)
      val h2 = flips.foldLeft(h1)((h, b) => h ^ (1L << b))
      (d * 1000 + i, h1, h2)
    }
    val df = pairs.toDF("pair_id", "h1", "h2")
    val k1 = df.select($"pair_id", $"h1", $"h2",
      explode(scheme.comboKeys($"h1")).as("ck"))
      .select($"pair_id", $"h1", $"h2",
        $"ck.combo_id".as("combo_id"), $"ck.key".as("key"))
    val k2 = df.select($"pair_id",
      explode(scheme.comboKeys($"h2")).as("ck"))
      .select($"pair_id", $"ck.combo_id".as("combo_id"), $"ck.key".as("key"))
    val shared = k1.join(k2, Seq("pair_id", "combo_id", "key"))
    // losslessness: every d ≤ 3 pair collides on ≥ 1 combo
    assert(shared.select($"pair_id").distinct().count() == pairs.size,
      s"a hamming<=3 pair produced no combo collision ($nbits-bit)")
    // exactly-once: precisely one shared combo is canonical per pair
    val canonical = shared
      .filter(scheme.canonicalOnly($"h1", $"h2", $"combo_id"))
      .groupBy($"pair_id").agg(count(lit(1)).as("n"))
    assert(canonical.count() == pairs.size &&
      canonical.filter($"n" =!= 1).count() == 0,
      s"canonical-combo emission is not exactly-once ($nbits-bit)")
  }

  test("Sim64 split: lossless for d<=3, canonical emission exactly-once") {
    checkScheme(Pigeonhole.Sim64, 64)
  }

  test("Hash63 split: lossless for d<=3, canonical emission exactly-once") {
    checkScheme(Pigeonhole.Hash63, 63)
  }

  test("mm_phash_pairs == brute-force hamming<=3 over the phash codes") {
    import spark.implicits._
    val codes = Multimodal.mmPerceptualHash(spark, sf)
      .select($"doc_id", $"phash").as[(Long, Long)].collect()
    val want = (for {
      (id1, p1) <- codes; (id2, p2) <- codes
      if id1 < id2 && java.lang.Long.bitCount(p1 ^ p2) <= 3
    } yield (id1, id2, java.lang.Long.bitCount(p1 ^ p2))).toSet
    val got = Multimodal.mmPhashPairs(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want, "blocked pair search != brute force")
  }
}
