package graft

/** r20 probe: run a query and print its EXECUTED (post-AQE) plan —
  * answers whether runtime exchange/scan reuse actually fires where the
  * initial plan shows duplicated subtrees (the FK-closure count fan-out).
  * Usage: Test/runMain graft.ProbeR20Exec <q1,...> [sfDir]
  */
object ProbeR20Exec {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      println(s"===== $name (executed) =====")
      println(df.queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
