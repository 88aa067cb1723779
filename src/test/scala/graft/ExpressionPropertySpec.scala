package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the native Catalyst expressions, driven
  * through the registered SQL surface so the whole analyze→eval path
  * is exercised. (scalatest+scalacheck without the bridge artifact:
  * generators sampled explicitly from a fixed seed.)
  */
class ExpressionPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val vecGen = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    .suchThat(v => v.exists(_ != 0.0))

  test("cosine similarity is symmetric and within [-1, 1]") {
    val lit = (v: List[Double]) => v.map(x => s"${x}d").mkString("array(", ",", ")")
    for (Seq(a, b) <- samples(vecGen, 40).grouped(2).toSeq if a != b) {
      val r = spark.sql(
        s"SELECT graft_cosine(${lit(a)}, ${lit(b)}) x, " +
        s"graft_cosine(${lit(b)}, ${lit(a)}) y").head()
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= -1.0000001 && r.getDouble(0) <= 1.0000001)
    }
  }

  test("simhash is order-invariant over token hashes") {
    val lit = (v: List[Long]) => v.map(x => s"${x}L").mkString("array(", ",", ")")
    val rnd = new scala.util.Random(7)
    for (hs <- samples(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)), 20)) {
      val r = spark.sql(
        s"SELECT graft_simhash64(${lit(hs)}) a, " +
        s"graft_simhash64(${lit(rnd.shuffle(hs))}) b").head()
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("md5 family edges: null in → null out, empty set → identity signature") {
    // null propagation through the whole analyze→eval path
    val r = spark.sql(
      "SELECT graft_md5lower64(cast(null as string)) a, " +
      "graft_simhash64_md5(cast(null as array<string>)) b, " +
      "graft_minhash_sig(cast(null as array<string>), 64) c").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // empty token set: simhash votes nothing (all bits 0), minhash
    // slots stay at the Long.MaxValue identity — callers block on
    // non-empty word sets, but the expressions must not crash
    val e = spark.sql(
      "SELECT graft_simhash64_md5(cast(array() as array<string>)) a, " +
      "graft_minhash_sig(cast(array() as array<string>), 4) b").collect()(0)
    assert(e.getLong(0) == 0L)
    assert(e.getSeq[Long](1).forall(_ == Long.MaxValue))
  }

  test("minhash sig rejects > 64 slots (rotate-xor period)") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array('x'), 65)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("period") ||
           err.getMessage.contains("64"), err.getMessage)
  }

  test("fused simhash equals the two-step transform + simhash64 formulation") {
    val r = spark.sql(
      "SELECT graft_simhash64_md5(array('spark','join','scan')) a, " +
      "graft_simhash64(transform(array('spark','join','scan'), " +
      "  w -> graft_md5lower64(w))) b").collect()(0)
    assert(r.getLong(0) == r.getLong(1), "fusion changed the hash")
  }

  test("length-pruning implication: jaccard >= t forces min/max size ratio >= t") {
    // the invariant graft.plans.JaccardLengthPruning relies on:
    // |A∩B| <= min(|A|,|B|) and |A∪B| >= max(|A|,|B|), so
    // j = |A∩B|/|A∪B| <= min/max — a pair the size test rejects can
    // never reach the threshold
    val lit = (v: List[String]) =>
      v.distinct.sorted.map(x => s"'$x'").mkString("array(", ",", ")")
    val wordGen = Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))
    for (Seq(a, b) <- samples(Gen.zip(wordGen, wordGen), 30).map(p => Seq(p._1, p._2))) {
      val r = spark.sql(
        s"SELECT graft_sorted_jaccard(${lit(a)}, ${lit(b)}) j").head()
      val (sa, sb) = (a.distinct.size.toDouble, b.distinct.size.toDouble)
      assert(r.getDouble(0) <= math.min(sa, sb) / math.max(sa, sb) + 1e-12,
        s"jaccard exceeded the size-ratio bound for |A|=$sa |B|=$sb")
    }
  }

  test("minhash bands are set-deterministic: equal sets, equal bands") {
    val lit = (v: List[String]) => v.map(x => s"'$x'").mkString("array(", ",", ")")
    val rnd = new scala.util.Random(11)
    val wordGen = Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))
    for (ws <- samples(wordGen, 20)) {
      val r = spark.sql(
        s"SELECT graft_minhash_bands(${lit(ws)}, 4, 4) a, " +
        s"graft_minhash_bands(${lit(rnd.shuffle(ws))}, 4, 4) b").head()
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
