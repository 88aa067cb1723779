package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.text.TextAnalysis

/** Layout operators: the Z-order key must actually cluster BOTH
  * dimensions (that is its entire point vs a single-column sort),
  * the mixture position must realize the configured source weights
  * in every prefix, and the bloom-pruned contamination must be
  * bit-identical to the exact operator while genuinely pruning.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  /** Chunk rows in `sortCol` order into groups of `chunk` (stand-ins
    * for output files) and return the mean normalized per-chunk span
    * of `dim` — 1.0 means every "file" spans the whole dimension
    * (no pruning possible), small means min/max file stats prune.
    */
  private def meanSpan(df: org.apache.spark.sql.DataFrame,
                       sortCol: String, dim: String, chunk: Int): Double = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(sortCol), $"doc_id")
    val spans = df
      .withColumn("file_id", ((row_number().over(w) - 1) / chunk).cast("long"))
      .groupBy($"file_id")
      .agg((max(col(dim)) - min(col(dim))).cast("double").as("span"))
    val full = df.agg((max(col(dim)) - min(col(dim))).cast("double")).head.getDouble(0)
    spans.agg(avg($"span")).head.getDouble(0) / full
  }

  test("z-order files stay narrow on BOTH dims; single-dim sort does not") {
    val z = Layout.pipelineZorder(spark, sf).persist()
    try {
      val n = z.count()
      val chunk = math.max(16, (n / 16).toInt)
      // z-order: both dimensions' per-file spans well under the full range
      val zLang = meanSpan(z, "zkey", "lang_code", chunk)
      val zLen  = meanSpan(z, "zkey", "len_clip", chunk)
      // length-only sort: perfect on length, useless on lang
      val lLang = meanSpan(z, "len_clip", "lang_code", chunk)
      val lLen  = meanSpan(z, "len_clip", "len_clip", chunk)
      assert(zLang < 0.6 && zLen < 0.6,
        s"z-order span fractions lang=$zLang len=$zLen — not clustering both dims")
      assert(zLang < lLang * 0.75,
        s"z-order lang span $zLang not better than length-sort's $lLang")
      assert(lLen <= zLen,
        s"sanity: single-dim sort must win on its own dim ($lLen vs $zLen)")
    } finally z.unpersist()
  }

  test("mixture prefixes realize the configured weights, no shuffle in the plan") {
    import spark.implicits._
    val m = Layout.pipelineMixture(spark, sf).persist()
    try {
      val n = m.count()
      val weights = Map("src0" -> 0.40, "src1" -> 0.25, "src2" -> 0.20,
                        "src3" -> 0.10, "src4" -> 0.05)
      // the mixture is an allowlist: only configured sources appear
      val extra = m.filter(!$"source".isInCollection(weights.keys.toSeq)).count()
      assert(extra == 0, s"$extra docs from sources outside the mixture spec")
      // every prefix (here: half and a fifth of the stream) carries
      // the sources in target proportion — the stride invariant
      for (frac <- Seq(0.5, 0.2)) {
        val k = (n * frac).toLong
        val prefix = m.orderBy($"mix_pos", $"doc_id").limit(k.toInt)
          .groupBy($"source").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        weights.foreach { case (s, w) =>
          val got = prefix.getOrElse(s, 0L).toDouble / k
          // 3σ binomial band around the target, floor 0.02 — small
          // prefixes are legitimately noisy, bias is not
          val tol = math.max(0.02, 3.0 * math.sqrt(w * (1 - w) / k))
          assert(math.abs(got - w) < tol,
            s"prefix $frac (k=$k): source $s at ${got} vs target $w ± $tol")
        }
      }
      // the position assignment itself is a pure projection + broadcast
      // join: assert NO shuffle exchange node in the physical plan
      // (typed collect, not string matching — Spark renders shuffles
      // as "Exchange hashpartitioning(...)", so the old
      // `contains("ShuffleExchange")` check could never fail)
      val executed = Layout.pipelineMixture(spark, sf)
        .queryExecution.executedPlan
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case other => other +: other.children.flatMap(allNodes)
      }
      val shuffles = allNodes(executed).collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"mixture plan has ${shuffles.size} shuffle(s):\n$executed")
    } finally m.unpersist()
  }

  test("bloom-pruned contamination == exact contamination, and it prunes") {
    import spark.implicits._
    val exact = TextAnalysis.txtContamination(spark, sf)
      .orderBy($"doc_id").collect().toSeq
    val bloom = TextAnalysis.txtContaminationBloom(spark, sf)
      .orderBy($"doc_id").collect().toSeq
    assert(exact == bloom, "bloom variant diverged from exact contamination")

    // the sketch really prunes: corpus shingles surviving the filter
    // are a small fraction of all corpus shingles (overlap + ~1% fp)
    val shingled = graft.core.Tables.documents(spark, sf)
      .withColumn("words", expr("split(trim(text), ' +')"))
      .withColumn("g", explode(expr(
        "array_distinct(transform(sequence(0, greatest(size(words)-5, 0)), " +
          "i -> graft_md5lower64(concat_ws(' ', slice(words, i+1, 5))) " +
          "& 9223372036854775807))")))
      .select($"doc_id", $"g")
    val eval = shingled.filter($"doc_id" % 29 === 0).persist()
    val sketch = eval.stat.bloomFilter("g", math.max(eval.count(), 1L), 0.01)
    eval.unpersist()
    val bytes = { val bos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(bos); bos.toByteArray }
    val corpus = shingled.filter($"doc_id" % 29 =!= 0)
    val total = corpus.count()
    val kept = corpus
      .filter(graft.functions.bloomMightContain(bytes, $"g")).count()
    assert(kept < total / 2,
      s"bloom kept $kept of $total corpus shingles — not pruning")
  }

  test("bloom sketch has no false negatives and a sane fp rate") {
    import spark.implicits._
    val members = (0L until 2000L).map(i => i * 2654435761L)
    val sketch = members.toDF("v").stat.bloomFilter("v", 2000, 0.01)
    val bytes = { val bos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(bos); bos.toByteArray }
    val hits = members.toDF("v")
      .filter(graft.functions.bloomMightContain(bytes, $"v")).count()
    assert(hits == members.size, s"false negatives: $hits/${members.size}")
    val strangers = (1L to 20000L).map(i => i * 7046029254386353131L + 13L)
    val fps = strangers.toDF("v")
      .filter(graft.functions.bloomMightContain(bytes, $"v")).count()
    assert(fps < 1000, s"fp rate ${fps / 20000.0} way over the 1% target")
  }

  test("pipeline_cap: two-level prefix scan == one global window; quota binds") {
    import spark.implicits._
    val cap = graft.operators.Analytics.pipelineCap(spark, sf)
    // semantic reference: the single global per-source window — the
    // formulation that does NOT scale (one sorted partition per
    // source), used here only as the oracle for the two-level scan
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"h", $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        expr("cast(size(split(trim(text), ' +')) as bigint)").as("n_tokens"))
      .withColumn("h", expr(
        "graft_md5lower64(cast(doc_id as string)) & 9223372036854775807"))
      .withColumn("cum_before",
        coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("admitted", $"cum_before" + $"n_tokens" <= 800L)
      .select($"doc_id", $"source", $"n_tokens", $"cum_before", $"admitted")
    assert(cap.except(ref).isEmpty && ref.except(cap).isEmpty,
      "bucketed two-level scan diverges from the global window")
    // the quota actually binds at this corpus: every source both
    // admits and rejects documents
    val per = cap.groupBy($"source")
      .agg(sum(when($"admitted", 1).otherwise(0)).as("in"),
           sum(when($"admitted", 0).otherwise(1)).as("out"))
      .as[(String, Long, Long)].collect()
    assert(per.nonEmpty && per.forall { case (_, in, out) => in > 0 && out > 0 },
      s"cap vacuous for some source: ${per.mkString(", ")}")
    // admitted token mass never exceeds the cap
    val over = cap.filter($"admitted")
      .groupBy($"source").agg(sum($"n_tokens").as("tok"))
      .filter($"tok" > 800L).count()
    assert(over == 0, "a source exceeded its token budget")
  }

  test("fixed-size sample: bounded-heap draw == the window twin; truncation binds") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 3
    val got = graft.operators.Analytics.pipelineFixedSample(spark, sf, k)
    // the window-sort formulation this op exists to avoid at scale —
    // semantically identical, so it is the correctness twin
    val want = graft.core.Tables.documents(spark, sf)
      .withColumn("h52", expr(
        "graft_md5lower64(concat('fsample:', cast(doc_id as string))) " +
          "& 4503599627370495"))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy($"source").orderBy($"h52", $"doc_id")).cast("int"))
      .filter($"sample_rank" <= k)
      .select($"source", $"doc_id", $"sample_rank")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0 &&
           want.exceptAll(got).count() == 0,
      "bounded-heap sample diverges from the window formulation")
    // truncation is active at k=3: every source draws exactly k
    val short = got.groupBy($"source").agg(count(lit(1)).as("n"))
      .filter($"n" =!= k).count()
    assert(short == 0, "a source drew fewer than k docs at spec scale")
  }

  test("epoch shuffle: 3 collision-free decorrelated orders, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sh = graft.operators.Analytics.pipelineShuffle(spark, sf)
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(sh.count() == 3 * n)
    // 63-bit keys are collision-free per epoch at any plausible size
    assert(sh.select($"epoch", $"order_key").distinct().count() == 3 * n)
    // shard really is the top 6 bits of the key, in [0, 64)
    assert(sh.filter($"shard" =!=
      expr("cast(order_key div 144115188075855872 as int)") ||
      $"shard" < 0 || $"shard" > 63).count() == 0)
    // epochs are DIFFERENT permutations of the same doc set: ranks
    // must disagree somewhere (identical orders would mean the seed
    // never entered the hash)
    val ranked = sh.withColumn("r",
      row_number().over(Window.partitionBy($"epoch").orderBy($"order_key")))
    val e0 = ranked.filter($"epoch" === 0).select($"doc_id", $"r".as("r0"))
    val e1 = ranked.filter($"epoch" === 1).select($"doc_id", $"r".as("r1"))
    assert(e0.join(e1, Seq("doc_id")).filter($"r0" =!= $"r1").count() > 0,
      "epochs 0 and 1 produced the identical order")
    // hash keys ⇒ reproducible across runs
    assert(sh.exceptAll(graft.operators.Analytics.pipelineShuffle(spark, sf))
      .count() == 0)
  }
}
