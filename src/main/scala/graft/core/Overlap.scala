package graft.core

import org.apache.spark.sql.SparkSession

/** Concurrent materialization of INDEPENDENT query branches (guide
  * §2.6 — actions are only sequential because the driver calls them
  * sequentially), with the failure semantics the r18 driver pools
  * lacked (r18 advisor, medium): every branch runs under one shared
  * Spark job group with `interruptOnCancel`, the wait is BOUNDED
  * (`spark.graft.overlapTimeoutSec`, default 3600 s), and any branch
  * failure or timeout cancels the whole group — sibling branches'
  * in-flight jobs die with the query instead of running on orphaned,
  * and a wedged branch surfaces as a TimeoutException instead of
  * hanging the query forever on `Await.result(…, Duration.Inf)`.
  */
object Overlap {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Run `thunks` from a `width`-thread pool and return their results
    * in order. Branch thunks MUST materialize eagerly (localCheckpoint
    * / count) — a lazily returned plan would escape the job group.
    */
  def run[T](spark: SparkSession, tag: String, width: Int)
            (thunks: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val sc = spark.sparkContext
    val group = s"graft-overlap-$tag-${seq.incrementAndGet()}"
    val timeoutSec =
      spark.conf.get("spark.graft.overlapTimeoutSec", "3600").toLong
    val pool = java.util.concurrent.Executors.newFixedThreadPool(width)
    try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      val fs = thunks.map(t => Future {
        sc.setJobGroup(group, s"graft $tag branch", interruptOnCancel = true)
        try t() finally sc.clearJobGroup()
      })
      try Await.result(Future.sequence(fs), timeoutSec.seconds)
      catch {
        case e: Throwable => sc.cancelJobGroup(group); throw e
      }
    } finally { pool.shutdownNow(); () }
  }
}
