package graft.ops

/** Overlap two INDEPENDENT blocking Spark actions (eager
  * localCheckpoints, agg-collects) so the wall cost is max(a, b)
  * instead of a + b: each is a job barrier, and run serially the
  * cluster sits idle through the latency of whichever isn't running.
  * Spark schedules jobs submitted from different threads into the same
  * executor pool (FIFO within the pool — at local[n] scale the win is
  * the barrier latency; on a real cluster both jobs' stages fill the
  * executors). Use ONLY for computations with no data dependency —
  * exactness/determinism are untouched, just the materialization
  * overlaps.
  */
private[graft] object Par {
  import scala.concurrent.{Await, Future}
  import scala.concurrent.duration.Duration
  import scala.concurrent.ExecutionContext.Implicits.global

  def both[A, B](a: => A, b: => B): (A, B) = {
    val fb = Future(b)
    val ra = a
    (ra, Await.result(fb, Duration.Inf))
  }

  /** Kick `b` off now; [[await]] it after interleaving other (lazy,
    * non-blocking) plan construction on the calling thread.
    */
  def future[B](b: => B): Future[B] = Future(b)

  def await[B](f: Future[B]): B = Await.result(f, Duration.Inf)
}
