package graft.sources

import java.util.concurrent.{Callable, ExecutionException, Executors}

import org.apache.spark.sql.SparkSession

/** Overlap INDEPENDENT per-directory commit/maintenance work.
  *
  * Spark's scheduler happily runs several jobs at once inside one
  * application; the per-partition-dir operations of the lake layer
  * (merge slices routed to different `part=` dirs, per-dir DV
  * reconciles, per-dir bootstraps) were only sequential because the
  * driver called them sequentially — and at bench scale each per-dir
  * commit is a handful of near-empty jobs whose wall is fixed
  * scheduling/planning latency, so N dirs paid N× that latency back to
  * back. Submitting them from a bounded pool overlaps the latency; the
  * jobs' tasks interleave on the same executors (FIFO back-fill).
  *
  * Safety contract for call sites: every item must target a DIFFERENT
  * snapshot-log directory (commits never contend on a CAS), and the
  * body must not mutate shared driver state without its own
  * synchronization. Results are returned in ITEM order, so callers'
  * outputs are order-independent of completion order.
  *
  * Pool width derives from the session's scheduler parallelism
  * (local[N] → N), so the driver's lower-core scaling legs shrink the
  * overlap with the machine instead of oversubscribing it; widthCap
  * bounds driver-side thread pressure.
  */
private[graft] object Par {

  private val widthCap = 8

  private def width(spark: SparkSession, n: Int): Int =
    math.min(math.min(n, widthCap),
      math.max(1, spark.sparkContext.defaultParallelism / 4))

  /** `items.map(f)` with up to [[width]] bodies in flight. Exceptions
    * from `f` propagate unwrapped (refusal messages are pinned by
    * callers/specs); remaining bodies still complete or are abandoned
    * best-effort before the first failure is rethrown. */
  def map[A, B](spark: SparkSession, items: Seq[A])(f: A => B): Seq[B] = {
    val w = width(spark, items.size)
    if (items.size <= 1 || w <= 1) items.map(f)
    else {
      val pool = Executors.newFixedThreadPool(w)
      try {
        val futs = items.map { a =>
          pool.submit(new Callable[B] {
            override def call(): B = {
              // active session is an InheritableThreadLocal the pool
              // thread may miss; commit paths resolve sessions through
              // it in places (SparkSession.active)
              SparkSession.setActiveSession(spark)
              f(a)
            }
          })
        }
        futs.map { fut =>
          try fut.get()
          catch {
            case e: ExecutionException if e.getCause != null =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
  }

  def foreach[A](spark: SparkSession, items: Seq[A])(f: A => Unit): Unit = {
    map(spark, items)(f); ()
  }
}
