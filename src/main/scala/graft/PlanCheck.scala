package graft

/** Dev utility: dump formatted physical plans for selected queries and
  * flag scale smells (missing pushdown, unexpected cartesian, no
  * broadcast where one is expected).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args(0).split(",").toSeq else Seq("f3_equi_filter")
    val spark = GraftSession.get()
    names.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
