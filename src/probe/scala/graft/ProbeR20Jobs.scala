package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** r20 optimization probe: per-query job/stage/task counts next to wall
  * time. At the bench SFs the parquet inputs are sub-MB, so wall is
  * dominated by orchestration (jobs submitted, stages scheduled, AQE
  * replans) rather than bytes — this probe localizes WHICH structural
  * costs a query pays so the optimization targets the right thing
  * (guide §1: measure first).
  *
  * Usage: Test/runMain graft.ProbeR20Jobs <q1,q2,...> [sfDir]
  */
object ProbeR20Jobs {
  private final class Counts extends SparkListener {
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    val taskMs = new AtomicLong(0)
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) taskMs.addAndGet(m.executorRunTime)
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val c = new Counts
    spark.sparkContext.addSparkListener(c)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      // settle the listener bus so counts don't bleed across queries
      Thread.sleep(300)
      val (j0, s0, t0, m0) = (c.jobs.get, c.stages.get, c.tasks.get, c.taskMs.get)
      val w0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(300)
      println(f"PROBE_JOBS $name%-36s wall=$wall%6.3f rows=$n%-8d jobs=${c.jobs.get - j0}%-4d stages=${c.stages.get - s0}%-4d tasks=${c.tasks.get - t0}%-5d taskSec=${(c.taskMs.get - m0) / 1e3}%7.2f")
    }
    spark.stop()
  }
}
