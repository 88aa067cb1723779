package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMBENCH (r17 verdict item 1): measured per-micro-batch wall
  * time for the five streaming stored-artifact ingests —
  * [[graft.streaming.DedupIngest]], [[graft.streaming.AnnIngest]],
  * [[graft.streaming.MvIngest]], [[graft.streaming.CdcIngest]],
  * [[graft.streaming.DsirIngest]] — the runtime twin of IngestSpec's
  * storage-bound assertions. The batch surface gets BENCH/SCALING
  * artifacts every round; this gives the streaming twins the same
  * standing evidence.
  *
  * Protocol: the source table splits into a SEED corpus (the stored
  * artifact's batch build) plus N EQUAL-SIZED micro-batch slices.
  * Slices are staged to parquet up front (untimed — slice derivation
  * is harness cost, not ingest cost) and moved file-by-file into the
  * live file-source directory between `processAllAvailable()` calls,
  * so each timed poll covers exactly one micro-batch: source
  * discovery, the foreachBatch body (decision join / encode /
  * partial aggregate), and the store append. The store's row count
  * is sampled untimed after each batch.
  *
  * PASS CRITERION: batch_sec stays flat across the run while
  * store_rows grows — per-batch cost ∝ batch size, not corpus size.
  * That is the designed contract of all five ingests (increment-sized
  * work per batch; the store is only ever READ through broadcast- or
  * partial-sized relations).
  *
  * Env: SPARK_GRAFT_SF_DIR (corpus), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_STREAM_BATCHES (default 8), SPARK_GRAFT_STREAM_INGESTS
  * (comma subset of dedup,ann,mv,cdc,dsir), SPARK_GRAFT_STREAMBENCH_DIR
  * (work dir, default /tmp/graft-streambench). Emits ONE JSON line on
  * stdout (the Bench convention).
  */
object StreamBench {

  private def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toVector
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
      finally walk.close()
    }

  /** Move one staged slice's parquet part files into the live source
    * dir — pure renames, so none of the slice-derivation or write
    * cost lands inside the timed poll. The slice id prefixes the
    * target name: a single partitioned write stamps every slice dir
    * with the SAME job UUID and repeating part numbers, so the raw
    * names collide across slices.
    */
  private def moveSliceIn(slice: Int, staging: java.nio.file.Path,
                          inDir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(staging)
    val parts = try s.iterator().asScala.toVector finally s.close()
    parts.filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => java.nio.file.Files.move(p,
        inDir.resolve(s"slice$slice-${p.getFileName.toString}")))
  }

  private def loadAvg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "?" }

  final case class Run(name: String, seedSec: Double, sliceRows: Long,
                       batchSec: Vector[Double], storeRows: Vector[Long])

  /** Drive one ingest end-to-end: stage slices, time the seed, start
    * the stream, time each micro-batch poll, sample store growth.
    */
  private def drive(spark: SparkSession, name: String, root: String,
                    stream: DataFrame, sliceExpr: String, n: Int,
                    seedFn: String => Unit,
                    startFn: (DataFrame, String, String) => StreamingQuery,
                    storeRowsFn: String => Long): Run = {
    import java.nio.file.{Files, Paths}
    rmTree(Paths.get(root))
    val (inDir, store, ckpt, staging) =
      (s"$root/in", s"$root/store", s"$root/ckpt", s"$root/staging")
    // one pass stages all N slices (partitioned write on the slice id)
    stream.withColumn("_slice", expr(sliceExpr))
      .write.partitionBy("_slice").parquet(staging)
    val sliceRows = spark.read.parquet(s"$staging/_slice=0").count()
    val t0 = System.nanoTime()
    seedFn(store)
    val seedSec = (System.nanoTime() - t0) / 1e9
    Files.createDirectories(Paths.get(inDir))
    val schema = spark.read.parquet(s"$staging/_slice=0").schema
    val q = startFn(
      spark.readStream.schema(schema).parquet(inDir), store, ckpt)
    val times = Vector.newBuilder[Double]
    val growth = Vector.newBuilder[Long]
    try {
      for (i <- 0 until n) {
        moveSliceIn(i, Paths.get(s"$staging/_slice=$i"), Paths.get(inDir))
        val b0 = System.nanoTime()
        q.processAllAvailable()
        val sec = (System.nanoTime() - b0) / 1e9
        times += sec
        growth += storeRowsFn(store) // untimed store-growth sample
        System.err.println(
          f"[streambench] $name batch $i: $sec%.2f s, store=${growth.result().last} rows")
      }
    } finally q.stop()
    spark.catalog.clearCache()
    Run(name, seedSec, sliceRows, times.result(), growth.result())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val root = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_DIR",
      "/tmp/graft-streambench")
    val only = sys.env.get("SPARK_GRAFT_STREAM_INGESTS")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("dedup", "ann", "mv", "cdc", "dsir"))
    val spark = graft.core.GraftSession.local(cpus)
    val loadStart = loadAvg()

    import spark.implicits._
    // warm the table scans once so footer/list costs don't land on
    // the first ingest's seed (the Bench warmup discipline)
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"text")
    val events = graft.core.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select($"vec_id", $"label", $"v")
    docs.count(); events.count(); vecs.count()

    val runs = Vector.newBuilder[Run]

    // DedupIngest: corpus = doc_id % 4 != 0 (the dedup_incremental
    // split), stream = doc_id % 4 == 0 in N equal slices
    if (only("dedup")) runs += drive(spark, "dedup", s"$root/dedup",
      docs.filter($"doc_id" % 4 === 0).select($"doc_id", $"text"),
      s"(doc_id div 4) % $n", n,
      store => graft.streaming.DedupIngest.seedIndex(
        docs.filter($"doc_id" % 4 =!= 0).select($"doc_id", $"text"), store),
      (s, store, ckpt) => graft.streaming.DedupIngest.start(
        s, store, s"$root/dedup/decisions", ckpt),
      store => graft.streaming.DedupIngest.readIndex(spark, store).count())

    // AnnIngest: codebook trained on even vec_ids, odd ids streamed
    if (only("ann")) runs += drive(spark, "ann", s"$root/ann",
      vecs.filter($"vec_id" % 2 === 1),
      s"(vec_id div 2) % $n", n,
      store => graft.similarity.AnnIndex.seed(
        vecs.filter($"vec_id" % 2 === 0), store),
      (s, store, ckpt) => graft.streaming.AnnIngest.start(s, store, ckpt),
      store => graft.similarity.AnnIndex.readCodes(spark, store).count())

    // MvIngest: aggregate view over the odd event half, streamed
    if (only("mv")) runs += drive(spark, "mv", s"$root/mv",
      events.filter($"event_id" % 2 === 1)
        .select($"event_id", $"event_type", $"ts", $"value"),
      s"(event_id div 2) % $n", n,
      store => graft.streaming.MvIngest.seed(
        events.filter($"event_id" % 2 === 0), store),
      (s, store, ckpt) => graft.streaming.MvIngest.start(s, store, ckpt),
      store => spark.read.parquet(store).count())

    // CdcIngest: keyed last-image table, same split
    if (only("cdc")) runs += drive(spark, "cdc", s"$root/cdc",
      events.filter($"event_id" % 2 === 1),
      s"(event_id div 2) % $n", n,
      store => graft.streaming.CdcIngest.seed(
        events.filter($"event_id" % 2 === 0), store),
      (s, store, ckpt) => graft.streaming.CdcIngest.start(s, store, ckpt),
      store => spark.read.parquet(store).count())

    // DsirIngest: bucket model over the same doc split as dedup
    if (only("dsir")) runs += drive(spark, "dsir", s"$root/dsir",
      docs.filter($"doc_id" % 4 === 0),
      s"(doc_id div 4) % $n", n,
      store => graft.streaming.DsirIngest.seed(
        docs.filter($"doc_id" % 4 =!= 0), store),
      (s, store, ckpt) => graft.streaming.DsirIngest.start(s, store, ckpt),
      store => spark.read.parquet(store).count())

    val all = runs.result()
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val ingestJson = all.map { r =>
      s""""${r.name}":{"seed_sec":${f"${r.seedSec}%.3f"},""" +
        s""""slice_rows":${r.sliceRows},""" +
        s""""batch_sec":${arr(r.batchSec)},""" +
        s""""store_rows":${r.storeRows.mkString("[", ",", "]")}}"""
    }.mkString(",")
    println(s"""{"metric":"streambench","unit":"sec","sf":"$sfDir",""" +
      s""""batches":$n,"load":{"start":"$loadStart","end":"${loadAvg()}"},""" +
      s""""ingests":{$ingestJson}}""")
    spark.stop()
  }
}
