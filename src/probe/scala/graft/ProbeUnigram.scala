package graft

/** Dev probe: where does the unigram trainer's plan blow up? */
object ProbeUnigram {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    def lap(tag: String): Unit =
      println(f"PROBE $tag at ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val df = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = graft.ops.UnigramLm.train(df, col("text"))
    lap("plan built")
    println("optimized plan size: " + out.queryExecution.optimizedPlan.treeString.length)
    out.count()
    lap("counted")
    spark.stop()
  }
}
