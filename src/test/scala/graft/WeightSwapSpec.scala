package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The weight-swap demonstration (round-12 verdict item 6): the two
  * declared stubs — txt_classifier's stand-in weights and the
  * multimodal decode features — load real(-shaped) weight artifacts
  * through the SAME plumbing. Identity artifacts must reproduce the
  * defaults bit-for-bit (proof the plumbing is identical), and
  * altered artifacts must change the scores (proof the data actually
  * flows).
  */
class WeightSwapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  test("classifier: checked-in identity artifact reproduces the default; flipped weights flip logits") {
    import spark.implicits._
    val default = graft.text.TextAnalysis.txtClassifier(spark, sf)
      .select($"doc_id", $"n_tokens", $"logit", $"keep")
      .as[(Long, Long, Long, Int)].collect().toMap2
    // the checked-in stub tabulates exactly the default Knuth mix
    val stub = new java.io.File(
      "tools/classifier_weights_stub.parquet").getAbsolutePath
    val viaStub = withConf("spark.graft.classifierWeights", stub) {
      graft.text.TextAnalysis.txtClassifier(spark, sf)
        .select($"doc_id", $"n_tokens", $"logit", $"keep")
        .as[(Long, Long, Long, Int)].collect().toMap2
    }
    assert(viaStub == default,
      "identity weight artifact changed the classifier output")
    // a sign-flipped model through the same plumbing: logits negate
    val flippedPath = Files.createTempDirectory("graft-wflip").toString +
      "/weights"
    spark.read.parquet(stub)
      .select($"bucket", (-$"w").as("w"))
      .write.parquet(flippedPath)
    val flipped = withConf("spark.graft.classifierWeights", flippedPath) {
      graft.text.TextAnalysis.txtClassifier(spark, sf)
        .select($"doc_id", $"n_tokens", $"logit", $"keep")
        .as[(Long, Long, Long, Int)].collect().toMap2
    }
    assert(flipped.keySet == default.keySet)
    flipped.foreach { case (id, (n, logit, keep)) =>
      val (dn, dLogit, _) = default(id)
      assert(n == dn && logit == -dLogit,
        s"doc $id: flipped logit $logit != -$dLogit")
      assert(keep == (if (logit >= 0) 1 else 0))
    }
    assert(flipped.exists { case (id, (_, _, keep)) =>
      keep != default(id)._3 }, "no keep decision changed — dead swap?")
  }

  test("classifier: a PARTIAL artifact keeps n_tokens invariant (absent buckets = default weight)") {
    import spark.implicits._
    // regression for the r13 advisor's low finding: the inner join on
    // bucket dropped every token whose bucket the artifact missed —
    // silently shrinking n_tokens (a model-independent count) and the
    // logit denominator. Absent buckets now coalesce to the default
    // weight, so a HALF artifact (buckets 0..127) must reproduce the
    // default output exactly when its rows tabulate the default mix.
    val default = graft.text.TextAnalysis.txtClassifier(spark, sf)
      .select($"doc_id", $"n_tokens", $"logit", $"keep")
      .as[(Long, Long, Long, Int)].collect().toMap2
    val stub = new java.io.File(
      "tools/classifier_weights_stub.parquet").getAbsolutePath
    val partialPath = Files.createTempDirectory("graft-wpart").toString +
      "/weights"
    spark.read.parquet(stub).filter($"bucket" < 128)
      .write.parquet(partialPath)
    val partial = withConf("spark.graft.classifierWeights", partialPath) {
      graft.text.TextAnalysis.txtClassifier(spark, sf)
        .select($"doc_id", $"n_tokens", $"logit", $"keep")
        .as[(Long, Long, Long, Int)].collect().toMap2
    }
    assert(partial == default,
      "partial identity artifact changed the output — missing " +
        "buckets are being dropped instead of defaulted")
  }

  test("classifier train -> swap: the TRAINED artifact routes through the loader and changes scores") {
    import spark.implicits._
    // the r13 verdict item 5 end-to-end: train the Naive Bayes
    // log-odds weights in-engine, write the artifact, load it through
    // spark.graft.classifierWeights, and the scores must change while
    // the model-independent count stays fixed
    val default = graft.text.TextAnalysis.txtClassifier(spark, sf)
      .select($"doc_id", $"n_tokens", $"logit", $"keep")
      .as[(Long, Long, Long, Int)].collect().toMap2
    val trained = graft.text.TextAnalysis.txtClassifierTrain(spark, sf)
    assert(trained.count() == 256, "trained artifact must cover all buckets")
    val trainedPath = Files.createTempDirectory("graft-wtrain").toString +
      "/weights"
    trained.select($"bucket", $"w").write.parquet(trainedPath)
    val scored = withConf("spark.graft.classifierWeights", trainedPath) {
      graft.text.TextAnalysis.txtClassifier(spark, sf)
        .select($"doc_id", $"n_tokens", $"logit", $"keep")
        .as[(Long, Long, Long, Int)].collect().toMap2
    }
    assert(scored.keySet == default.keySet)
    scored.foreach { case (id, (n, _, _)) =>
      assert(n == default(id)._1,
        s"doc $id: n_tokens changed under the trained model")
    }
    assert(scored.exists { case (id, (_, logit, _)) =>
      logit != default(id)._2 },
      "no logit changed — the trained weights did not flow")
    // the trained gate must actually separate the reference slice:
    // en docs' mean per-token logit above the non-en mean (log-odds
    // trained FOR the en slice)
    val perLang = withConf("spark.graft.classifierWeights", trainedPath) {
      graft.text.TextAnalysis.txtClassifier(spark, sf)
        .groupBy($"lang")
        .agg((sum($"logit") / sum($"n_tokens")).as("mean_w"))
        .as[(String, Double)].collect().toMap
    }
    val nonEn = perLang.filter(_._1 != "en").values
    assert(perLang("en") > nonEn.max,
      s"trained gate does not separate the reference slice: $perLang")
  }

  test("decode: identity lookup reproduces the stub; doubled weights double every frame feature") {
    import spark.implicits._
    val default = graft.multimodal.Multimodal.mmDecodeBatch(spark, sf)
      .select($"doc_id", $"frame_idx", $"frame_chars", $"frame_cpsum")
      .as[(Long, Int, Int, Long)].collect().toSet
    // the corpus's code-point alphabet — the domain a real model file
    // would cover
    val cps = graft.core.Tables.documents(spark, sf)
      .select($"text").as[String]
      .flatMap(_.codePoints().toArray.toSeq).distinct().collect()
    val root = Files.createTempDirectory("graft-decw").toString
    cps.toSeq.map(cp => (cp.toLong, cp.toLong))
      .toDF("cp", "w").write.parquet(s"$root/identity")
    cps.toSeq.map(cp => (cp.toLong, 2L * cp))
      .toDF("cp", "w").write.parquet(s"$root/doubled")
    val viaIdentity = withConf("spark.graft.decodeWeights",
        s"$root/identity") {
      graft.multimodal.Multimodal.mmDecodeBatch(spark, sf)
        .select($"doc_id", $"frame_idx", $"frame_chars", $"frame_cpsum")
        .as[(Long, Int, Int, Long)].collect().toSet
    }
    assert(viaIdentity == default,
      "identity decode weights changed the features")
    val doubled = withConf("spark.graft.decodeWeights", s"$root/doubled") {
      graft.multimodal.Multimodal.mmDecodeBatch(spark, sf)
        .select($"doc_id", $"frame_idx", $"frame_chars", $"frame_cpsum")
        .as[(Long, Int, Int, Long)].collect().toSet
    }
    assert(doubled ==
      default.map { case (d, i, c, s) => (d, i, c, 2 * s) },
      "doubled decode weights did not double the frame features")
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  /** (doc_id -> (n_tokens, logit, keep)) for order-free comparison. */
  private implicit class Rows(
      rs: Array[(Long, Long, Long, Int)]) {
    def toMap2: Map[Long, (Long, Long, Int)] =
      rs.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
