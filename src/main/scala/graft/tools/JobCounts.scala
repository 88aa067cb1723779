package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** Throwaway per-query job/stage counter (r18 verdict item 8: the
  * whole-bench floor is ~one AQE stage job per exchange/broadcast —
  * find the cheapest keys paying the most jobs). One pass over the
  * bench keys at the given SF dir with the bench action, printing
  * (jobs, stages, seconds) per key.
  */
object JobCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
    })
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = (only match {
      case Some(names) => graft.SparkEntry.queries
        .filter { case (n, _) => names(n) }
      case None => graft.SparkEntry.queries
    }).toSeq.sortBy(_._1)
    // warmup (JIT, codegen, parquet footers) — uncounted
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (t <- graft.core.Tables.All if t != "events")
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    try graft.core.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    Thread.sleep(500)
    println(f"[jobcounts] ${"key"}%-28s  jobs stages    sec")
    for ((name, fn) <- selected) {
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        System.err.println(s"[jobcounts] $name FAILED: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"[jobcounts] $name%-28s ${jobs.get}%5d ${stages.get}%6d $sec%6.2f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
