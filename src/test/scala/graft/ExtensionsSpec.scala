package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface registered by GraftExtensions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graft_cosine is callable from SQL and agrees with itself") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1d,0d,0d), array(1d,0d,0d)) c1, " +
      "graft_cosine(array(1d,0d), array(0d,1d)) c2").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("graft_simhash64 of identical token hash sets is equal") {
    val r = spark.sql(
      "SELECT graft_simhash64(array(1L, 2L, 3L)) = graft_simhash64(array(3L, 2L, 1L)) eq").head()
    assert(r.getBoolean(0))
  }

  test("graft_minhash_bands emits the requested band count") {
    val r = spark.sql(
      "SELECT size(graft_minhash_bands(array('a','b','c'), 8, 8)) n").head()
    assert(r.getInt(0) == 8)
  }

  test("graft_hyperplane_buckets is deterministic across calls") {
    val r = spark.sql(
      "SELECT graft_hyperplane_buckets(array_repeat(0.5d, 64), 4, 8) a, " +
      "graft_hyperplane_buckets(array_repeat(0.5d, 64), 4, 8) b").head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0).length == 4)
  }
}
