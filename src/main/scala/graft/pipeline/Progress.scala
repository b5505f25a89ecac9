package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** G2: running job progress via `SparkListener` — the engine-side
  * analog of the reference's progress callbacks (`subset/src/lib.rs:
  * 15-30`, emission `subset/src/postgres.rs:241-267`; byte totals
  * `tasks/full_dump.rs:76-106`): cumulative rows/bytes read and
  * written, reported through a callback as tasks finish. The reference
  * counts rows on one thread; here the totals aggregate across every
  * executor's task metrics, so the same "processed X of Y" UX survives
  * a 1000-executor job.
  */
final class ProgressListener(report: ProgressListener.Snapshot => Unit)
    extends SparkListener {

  private val rowsRead = new AtomicLong
  private val bytesRead = new AtomicLong
  private val rowsWritten = new AtomicLong
  private val bytesWritten = new AtomicLong
  private val tasksDone = new AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      rowsRead.addAndGet(m.inputMetrics.recordsRead)
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      rowsWritten.addAndGet(m.outputMetrics.recordsWritten)
      bytesWritten.addAndGet(m.outputMetrics.bytesWritten)
      tasksDone.incrementAndGet()
      report(snapshot)
    }
  }

  def snapshot: ProgressListener.Snapshot =
    ProgressListener.Snapshot(
      rowsRead.get, bytesRead.get, rowsWritten.get, bytesWritten.get, tasksDone.get)
}

object ProgressListener {

  final case class Snapshot(
      rowsRead: Long,
      bytesRead: Long,
      rowsWritten: Long,
      bytesWritten: Long,
      tasksDone: Long)

  /** Run `body` with a registered progress listener; returns (result,
    * final snapshot). The listener is always removed, and the final
    * snapshot is read after a bounded drain wait so late task-end
    * events (the listener bus is async) are included.
    */
  def track[A](spark: SparkSession, report: Snapshot => Unit = _ => ())(body: => A): (A, Snapshot) = {
    val listener = new ProgressListener(report)
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = body
      // bounded drain: wait until the task counter stops moving
      var last = -1L
      var spins = 0
      while (listener.snapshot.tasksDone != last && spins < 50) {
        last = listener.snapshot.tasksDone
        Thread.sleep(100)
        spins += 1
      }
      (result, listener.snapshot)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
