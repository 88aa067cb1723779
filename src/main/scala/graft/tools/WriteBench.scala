package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Write-path benchmark for the delivery contracts (round-10 verdict
  * item 7): every pipeline op is benched as a QUERY elsewhere; this
  * main times the operators whose real product is a parquet WRITE —
  * the epoch-shuffle and curriculum `repartitionByRange` TeraSort
  * writers, the 16-way hash-sharded write, and the z-order layout —
  * actually writing the document payload once at the given SF, and
  * asserts the physical layout each contract promises (range-disjoint
  * files per epoch/phase, balanced shard dirs) from the written
  * files' own metadata profile.
  *
  * Usage: runMain graft.tools.WriteBench <sfDir> [outJson]
  * Prints one JSON line (and optionally writes it to outJson):
  * per op — seconds, rows, files, bytes, per-file row profile
  * (min/median/max), and the layout-contract check.
  */
object WriteBench {

  private def dirBytes(p: Path): Long = {
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(p)
    try walk.iterator().asScala
      .filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map(Files.size).sum
    finally walk.close()
  }

  /** Per-written-file row count + [lo, hi] of an order column set,
    * from the files themselves (metadata-sized: ≤ files rows).
    */
  private def fileProfile(spark: SparkSession, dir: String,
                          ordCols: Seq[String]): Array[(String, Long, Seq[Long], Seq[Long])] = {
    val df = spark.read.parquet(dir)
    // LEXICOGRAPHIC per-file bounds via struct min/max — per-column
    // min/max would understate a multi-column range ((1,900) ranks
    // below (2,100) but columnwise mins compose to (1,100))
    val s = struct(ordCols.map(col): _*)
    df.groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min(s).as("lo"), max(s).as("hi"))
      .collect().map { r =>
        def longs(i: Int) = r.getStruct(i).toSeq
          .map(_.asInstanceOf[Number].longValue())
        (r.getString(0), r.getLong(1), longs(2), longs(3))
      }
  }

  /** Are the files' [lo, hi] ranges (lexicographic over the order
    * columns) pairwise disjoint? The physical guarantee a
    * repartitionByRange + sortWithinPartitions writer makes: a reader
    * streaming files in range order sees the delivery order.
    */
  private def disjoint(profile: Array[(String, Long, Seq[Long], Seq[Long])]): Boolean = {
    implicit val ord: Ordering[Seq[Long]] =
      Ordering.Implicits.seqOrdering[Seq, Long]
    val sorted = profile.sortBy(_._3)
    sorted.sliding(2).forall {
      case Array(a, b) => ord.lt(a._4, b._3)
      case _           => true
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args.lift(1)
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32))
    import spark.implicits._
    val root = Files.createTempDirectory("graft-writebench")

    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"lang", $"text")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, String]()

    def report(op: String, secs: Double, dir: Path,
               profile: Array[(String, Long, Seq[Long], Seq[Long])],
               contract: String, ok: Boolean): Unit = {
      val ns = profile.map(_._2).sorted
      val bytes = dirBytes(dir)
      results(op) =
        s"""{"sec":${math.round(secs * 100) / 100.0},"rows":${ns.sum},""" +
        s""""files":${ns.length},"bytes":$bytes,""" +
        s""""mb_per_sec":${math.round(bytes / 1e6 / secs * 10) / 10.0},""" +
        s""""file_rows":{"min":${ns.head},"med":${ns(ns.length / 2)},"max":${ns.last}},""" +
        s""""contract":"$contract","contract_ok":$ok}"""
    }

    // 1. epoch-shuffle delivery: 3 epochs of the corpus, each in its
    // epoch's hash order — repartitionByRange over (epoch, order_key)
    // + sortWithinPartitions (TeraSort shape), files split per epoch
    {
      val dir = root.resolve("shuffle")
      val rel = graft.operators.Analytics.pipelineShuffle(spark, sfDir)
        .join(docs, Seq("doc_id", "source"))
      val (_, secs) = timed {
        rel.repartitionByRange($"epoch", $"order_key")
          .sortWithinPartitions($"epoch", $"order_key")
          .write.partitionBy("epoch").parquet(dir.toString)
      }
      // per epoch, file key-ranges must be pairwise disjoint
      val ok = (0 to 2).forall { ep =>
        disjoint(fileProfile(spark, s"$dir/epoch=$ep", Seq("order_key")))
      }
      report("pipeline_shuffle_write", secs, dir,
        fileProfile(spark, dir.toString, Seq("order_key")),
        "per-epoch file order_key ranges disjoint", ok)
    }

    // 2. curriculum delivery: phase-then-order_key range write — a
    // reader walking files in range order replays the easy-to-hard
    // schedule
    {
      val dir = root.resolve("curriculum")
      val rel = graft.operators.Analytics.pipelineCurriculum(spark, sfDir)
        .join(docs, Seq("doc_id", "source"))
      val (_, secs) = timed {
        rel.repartitionByRange($"phase", $"order_key")
          .sortWithinPartitions($"phase", $"order_key")
          .write.parquet(dir.toString)
      }
      val profile = fileProfile(spark, dir.toString, Seq("phase", "order_key"))
      report("pipeline_curriculum_write", secs, dir, profile,
        "file (phase, order_key) ranges disjoint", disjoint(profile))
    }

    // 3. 16-way salted shard write: one dir per shard, hash-balanced
    {
      val dir = root.resolve("shard")
      val rel = docs.withColumn("shard", expr(
        "(graft_md5lower64(concat('shard:', cast(doc_id as string))) " +
          "& 9223372036854775807) % 16"))
      val (_, secs) = timed {
        rel.repartition($"shard")
          .write.partitionBy("shard").parquet(dir.toString)
      }
      val perShard = spark.read.parquet(dir.toString)
        .groupBy($"shard").agg(count(lit(1)).as("n"))
        .select($"n").as[Long].collect()
      val spread = perShard.max.toDouble / perShard.min
      // the 1.3 balance bound is a SCALE property (hash uniformity);
      // below ~100k rows per-shard counts are sampling noise
      val ok = perShard.length == 16 &&
        (perShard.sum < 100000 || spread <= 1.3)
      report("pipeline_shard_write", secs, dir,
        fileProfile(spark, dir.toString, Seq("doc_id")),
        f"16 shard dirs, doc spread $spread%.3f (bound 1.3 at >=100k rows)",
        ok)
    }

    // 4. z-order layout write: interleaved (lang, length) bits as the
    // range key — both dimensions cluster per file (LayoutSpec
    // measures the span; here the real files are written and the key
    // ranges checked)
    {
      val dir = root.resolve("zorder")
      val rel = graft.operators.Layout.pipelineZorder(spark, sfDir)
        .select($"doc_id", $"zkey")
        .join(docs, Seq("doc_id"))
      val (_, secs) = timed {
        rel.repartitionByRange($"zkey")
          .sortWithinPartitions($"zkey")
          .write.parquet(dir.toString)
      }
      val profile = fileProfile(spark, dir.toString, Seq("zkey"))
      report("pipeline_zorder_write", secs, dir, profile,
        "file zkey ranges disjoint", disjoint(profile))
    }

    // 5. mixture-interleave delivery: range-write by mix_pos so any
    // file-order prefix of the stream realizes the configured source
    // mixture (the stride-scheduling invariant, asserted per-file)
    {
      val dir = root.resolve("mixture")
      val rel = graft.operators.Layout.pipelineMixture(spark, sfDir)
        .join(docs, Seq("doc_id", "source"))
      val (_, secs) = timed {
        rel.repartitionByRange($"mix_pos")
          .sortWithinPartitions($"mix_pos")
          .write.parquet(dir.toString)
      }
      val profile = fileProfile(spark, dir.toString, Seq("mix_pos"))
      // every file-order PREFIX of the delivery realizes the top
      // source's configured 40% share — VALID up to the position where
      // the first source's stream ends (position ranges are
      // 2³²·stride_s per source, so the guarantee covers prefixes
      // [0, min_s max_pos_s); beyond it sources drop out by design —
      // the boundary is read from the written data itself)
      val written = spark.read.parquet(dir.toString)
      val minMax = written.groupBy($"source").agg(max($"mix_pos").as("mp"))
        .agg(min($"mp")).head.getLong(0)
      val ordered = profile.sortBy(_._3.head)
      val byFile = written
        .groupBy(input_file_name().as("f"))
        .agg(count(lit(1)).as("n"),
             count(when($"source" === "src0", 1)).as("n0"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      var cn = 0L; var c0 = 0L; var checked = 0
      val prefixOk = ordered.forall { case (f, _, _, hi) =>
        val (n, n0) = byFile(f); cn += n; c0 += n0
        hi.head > minMax || cn < 20000 || {
          checked += 1; math.abs(c0.toDouble / cn - 0.4) < 0.05
        }
      }
      report("pipeline_mixture_write", secs, dir, profile,
        s"file mix_pos ranges disjoint + every >=20k-row in-range prefix ($checked checked) within 5pp of the 40% share",
        disjoint(profile) && prefixOk && checked >= 3)
    }

    val json = "{" +
      s""""sf":"$sfDir","cpus":${spark.sparkContext.defaultParallelism},""" +
      results.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}"
    println(json)
    outJson.foreach(p => Files.write(Paths.get(p),
      json.getBytes("UTF-8")))
    // leave nothing behind: the written data was the measurement
    def rm(p: Path): Unit = {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(Files.delete)
      finally walk.close()
    }
    rm(root)
    spark.stop()
  }
}
