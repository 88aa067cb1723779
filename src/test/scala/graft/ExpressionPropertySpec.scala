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

  test("packed-cell generators equal their join-path twins (ties included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random cells INCLUDING duplicated vectors, so exact cosine ties
    // exercise the id tiebreak on both paths
    val rnd = new scala.util.Random(7)
    val base = (0L until 60L).map { id =>
      (id, id % 3, List.fill(16)(rnd.nextDouble() * 20 - 10))
    }
    val dups = base.take(6).map { case (id, l, v) => (id + 1000L, l, v) }
    val e = (base ++ dups).toDF("vec_id", "label", "v")
    e.createOrReplaceTempView("cells_prop")

    val packedTopK = e.groupBy($"label")
      .agg(collect_list(struct($"vec_id", $"v")).as("vecs"))
      .select(graft.functions.cellTopK($"vecs", 4)
        .as(Seq("vec_id", "neighbor_id", "rank", "cosine")))
      .select($"vec_id", $"neighbor_id", $"rank", round($"cosine", 6).as("c"))
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"cos".desc, $"nbr_id")
    val joinTopK = e.join(
        e.select($"label", $"vec_id".as("nbr_id"), $"v".as("nv")), Seq("label"))
      .filter($"vec_id" =!= $"nbr_id")
      .withColumn("cos", graft.functions.cosineSim($"v", $"nv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 4)
      .select($"vec_id", $"nbr_id".as("neighbor_id"), $"rank",
              round($"cos", 6).as("c"))
      .collect().toSet
    assert(packedTopK == joinTopK, "CellTopK diverges from the window path")

    val packedPairs = e.groupBy($"label")
      .agg(collect_list(struct($"vec_id", $"v")).as("vecs"))
      .select(graft.functions.cellSimPairs($"vecs", 0.2)
        .as(Seq("a", "b", "cos")))
      .select($"a", $"b", round($"cos", 6).as("c"))
      .collect().toSet
    val joinPairs = e.join(
        e.select($"label", $"vec_id".as("b"), $"v".as("nv")), Seq("label"))
      .filter($"vec_id" < $"b")
      .withColumn("cos", graft.functions.cosineSim($"v", $"nv"))
      .filter($"cos" >= 0.2)
      .select($"vec_id".as("a"), $"b", round($"cos", 6).as("c"))
      .collect().toSet
    assert(packedPairs == joinPairs, "CellSimPairs diverges from the join path")

    // SQL surface: the registered generator runs end-to-end
    val viaSql = spark.sql(
      """SELECT vec_id, neighbor_id FROM (
        |  SELECT label, collect_list(struct(vec_id, v)) AS vecs
        |  FROM cells_prop GROUP BY label
        |) LATERAL VIEW graft_cell_topk(vecs, 4) AS vec_id, neighbor_id, rank, cosine
        |""".stripMargin).count()
    assert(viaSql == packedTopK.size)
  }

  test("BitsToMask + MaskJaccard == SortedJaccard on random sets (any mask width)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random subsets of a 0..4095 bit universe, compared through BOTH
    // verify paths: the mask pair (bits → fixed-width long-array mask →
    // popcount loop) must be bit-identical to the string merge scan on
    // the corresponding zero-padded token strings (zero-padding makes
    // lexicographic order == numeric order, so the arrays are sorted
    // for SortedJaccard by construction)
    val universe = Gen.choose(0, 4095)
    val setGen = Gen.chooseNum(1, 200)
      .flatMap(n => Gen.listOfN(n, universe)).map(_.distinct.sorted)
    val pairs = samples(setGen, 60).grouped(2).collect {
      case Seq(a, b) => (a, b)
    }.toSeq
    val df = pairs.toDF("xa", "xb")
      .withColumn("wa", expr("transform(xa, b -> lpad(cast(b as string), 4, '0'))"))
      .withColumn("wb", expr("transform(xb, b -> lpad(cast(b as string), 4, '0'))"))
      .withColumn("mask_j", graft.functions.maskJaccard(
        graft.functions.bitsToMask($"xa", 64),
        graft.functions.bitsToMask($"xb", 64)))
      .withColumn("scan_j", graft.functions.sortedJaccard($"wa", $"wb"))
    val rows = df.select($"mask_j", $"scan_j").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"mask ${r.getDouble(0)} != scan ${r.getDouble(1)}")
    }
    // degenerate edges: disjoint sets → 0, identical sets → 1
    val edge = Seq((Seq(0, 63, 64, 127), Seq(0, 63, 64, 127)),
                   (Seq(0, 1), Seq(4000, 4095)))
      .toDF("xa", "xb")
      .select(graft.functions.maskJaccard(
        graft.functions.bitsToMask($"xa", 64),
        graft.functions.bitsToMask($"xb", 64)).as("j"))
      .collect().map(_.getDouble(0)).toSeq
    assert(edge == Seq(1.0, 0.0))
  }

  test("phash63 == the segment/codepoint-sum expression pipeline") {
    import spark.implicits._
    // the pre-fusion formulation, kept here as the reference
    val pipeline =
      "aggregate(zip_with(" +
        "transform(sequence(0, 62), i -> struct(" +
          "((i+1)*len) div 63 - (i*len) div 63 as w, " +
          "graft_codepoint_sum(substring(s, cast((i*len) div 63 as int) + 1, " +
            "cast(((i+1)*len) div 63 - (i*len) div 63 as int))) as s)), " +
        "sequence(0, 62), (p, i) -> IF(p.s * len > " +
          "aggregate(transform(sequence(0, 62), j -> " +
            "graft_codepoint_sum(substring(s, cast((j*len) div 63 as int) + 1, " +
              "cast(((j+1)*len) div 63 - (j*len) div 63 as int)))), " +
            "0L, (acc, x) -> acc + x) * p.w, " +
          "shiftleft(1L, cast(i as int)), 0L)), 0L, (acc, x) -> acc + x)"
    val edge = Seq(
      "a", "ab", "aaaaaaa", "abcdefghij",
      ("x" * 62), ("x" * 63), ("x" * 64), ("y" * 1000),
      "na\u00efve caf\u00e9 \u4f60\u597d\u4e16\u754c " * 9,
      (1 to 200).map(i => ('a' + i % 26).toChar).mkString,
      "\ud83d\ude00\ud83d\ude01\ud83d\ude02" * 30)
    val rnd = new scala.util.Random(11)
    val fuzz = (1 to 60).map(_ => rnd.alphanumeric
      .take(1 + rnd.nextInt(400)).mkString)
    val df = (edge ++ fuzz).toDF("s")
      .withColumn("len", org.apache.spark.sql.functions.expr(
        "cast(length(s) as bigint)"))
    val bad = df.selectExpr(
        "s", "graft_phash63(s) AS native", s"$pipeline AS ref")
      .where("native != ref")
    assert(bad.count() == 0, bad.take(3).mkString(";"))
    // and on the corpus itself (the operator's real input)
    val docs = graft.core.Tables.documents(spark, SparkTestSession.Sf)
      .where("length(text) > 0")
      .selectExpr("text AS s", "cast(length(text) as bigint) AS len")
    val badCorpus = docs.selectExpr(
        "graft_phash63(s) AS native", s"$pipeline AS ref")
      .where("native != ref")
    assert(badCorpus.count() == 0)
  }

  test("shingle_md5 == the slice/concat_ws/md5 lambda pipeline") {
    import spark.implicits._
    def pipeline(n: Int) =
      s"transform(sequence(0, greatest(size(words)-$n, 0)), " +
      s"i -> graft_md5lower64(concat_ws(' ', slice(words, i+1, $n))) " +
      "& 9223372036854775807)"
    val rnd = new scala.util.Random(23)
    val vocab = Vector("the", "a", "na\u00efve", "\u4f60\u597d", "word",
      "x", "\ud83d\ude00", "longer-token", "7", "")
    val cases = Seq(Seq.empty[String], Seq("solo"), Seq("two", "words"),
      // concat_ws SKIPS null elements — the fused form must match
      Seq("a", null, "b"), Seq(null, null), Seq("x", null, "y", "z", null, "w")) ++
      (1 to 60).map(_ => Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))))
    val df = cases.map(Tuple1(_)).toDF("words")
    for (n <- Seq(4, 5)) {
      val bad = df.selectExpr(s"graft_shingle_md5(words, $n) AS a",
          s"${pipeline(n)} AS b")
        .where("a != b")
      assert(bad.count() == 0, s"n=$n: " + bad.take(2).mkString(";"))
    }
    // and over the corpus's real word arrays
    val docs = graft.core.Tables.documents(spark, SparkTestSession.Sf)
      .selectExpr("split(trim(text), ' +') AS words")
    val badCorpus = docs.selectExpr("graft_shingle_md5(words, 5) AS a",
        s"${pipeline(5)} AS b").where("a != b")
    assert(badCorpus.count() == 0)
  }

  test("punct_count / bpe_count == their regexp_count pipelines") {
    import spark.implicits._
    // unicode (2- and 3-byte, and a surrogate-pair emoji = one code
    // point), uppercase, digits bordering letters, runs, whitespace
    // variants, empty string
    val cases = Seq("", " ", "abc", "ABC", "a1b2", "  a,b.c!  ",
      "na\u00efve caf\u00e9", "\u4f60\u597d, world 123",
      "\ud83d\ude00x\ud83d\ude00", "tabs\tand\nnewlines",
      "a-b_c+d=e", "123 456", "mixedCASE99words", "!!!", "a  b   c")
    val df = cases.map(Tuple1(_)).toDF("s")
    val badP = df.selectExpr("graft_punct_count(s) AS a",
        "cast(regexp_count(s, '[^a-z0-9 ]') as bigint) AS b")
      .where("a != b")
    assert(badP.count() == 0, badP.take(5).mkString(";"))
    val badB = df.selectExpr("graft_bpe_count(s) AS a",
        "cast(regexp_count(s, '[a-z]+|[0-9]+|[^a-z0-9 ]') as bigint) AS b")
      .where("a != b")
    assert(badB.count() == 0, badB.take(5).mkString(";"))
    // and over the corpus text (the operators' real input)
    val docs = graft.core.Tables.documents(spark, SparkTestSession.Sf)
    val badCorpus = docs.selectExpr(
        "graft_punct_count(text) AS a",
        "cast(regexp_count(text, '[^a-z0-9 ]') as bigint) AS b",
        "graft_bpe_count(text) AS c",
        "cast(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') as bigint) AS d")
      .where("a != b OR c != d")
    assert(badCorpus.count() == 0)
  }

  test("window_min == the transform/slice/array_min pipeline incl. empty and null edges") {
    import spark.implicits._
    val pipeline = "transform(sequence(0, greatest(size(h)-4, 0)), " +
      "j -> array_min(slice(h, j+1, 4)))"
    val rnd = new scala.util.Random(29)
    val cases: Seq[Seq[java.lang.Long]] =
      Seq(Seq.empty[java.lang.Long], Seq(7L: java.lang.Long),
        Seq[java.lang.Long](null, null), Seq[java.lang.Long](3L, null, 1L),
        Seq[java.lang.Long](null, 5L, null, null, 2L, null)) ++
      (1 to 40).map(_ => Seq.fill(rnd.nextInt(12))(
        if (rnd.nextInt(5) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong())))
    val df = cases.map(Tuple1(_)).toDF("h")
    val bad = df.selectExpr("graft_window_min(h, 4) AS a", s"$pipeline AS b")
      .where("NOT (a <=> b)")
    assert(bad.count() == 0, bad.take(3).mkString(";"))
  }
}
