package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** r21 optimization probe (VERDICT r20 #5): per-JOB task-time breakdown
  * for a query, so the wall cost of a multi-job operator (eager pins →
  * final action) maps onto its phases. Each eager `localCheckpoint`
  * submits its own job, so job boundaries ARE the operator's phase
  * boundaries; the job group/description and the first stage's name
  * give enough to attribute a job to a pin or the terminal count.
  *
  * Usage: Test/runMain graft.ProbeR21Breakdown <q1,q2,...> [sfDir]
  */
object ProbeR21Breakdown {

  private final class PerJob extends SparkListener {
    val stageToJob = new TrieMap[Int, Int]()
    val jobDesc = new TrieMap[Int, String]()
    val jobTaskMs = new TrieMap[Int, Long]()
    val jobTasks = new TrieMap[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      // the action's callsite ("localCheckpoint at Dedup.scala:81",
      // "count at ...") names the phase that submitted this job
      val site = j.stageInfos.lastOption.map(_.name).getOrElse("")
      jobDesc.put(j.jobId, site.takeRight(60))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      stageToJob.get(t.stageId).foreach { j =>
        val m = t.taskMetrics
        if (m != null) {
          jobTaskMs.updateWith(j) { v => Some(v.getOrElse(0L) + m.executorRunTime) }
          jobTasks.updateWith(j) { v => Some(v.getOrElse(0L) + 1L) }
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass (plan, JIT, artifact builds) so the measured run is steady-state
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      Thread.sleep(400)
      val c = new PerJob
      spark.sparkContext.addSparkListener(c)
      val w0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(400)
      spark.sparkContext.removeSparkListener(c)
      println(f"PROBE_BRK $name wall=$wall%.3f rows=$n jobs=${c.jobDesc.size}")
      c.jobDesc.keys.toSeq.sorted.foreach { j =>
        val ms = c.jobTaskMs.getOrElse(j, 0L)
        val nt = c.jobTasks.getOrElse(j, 0L)
        println(f"PROBE_BRK   job=$j%-4d taskSec=${ms / 1e3}%7.2f tasks=$nt%-5d desc=${c.jobDesc(j)}")
      }
    }
    spark.stop()
  }
}
