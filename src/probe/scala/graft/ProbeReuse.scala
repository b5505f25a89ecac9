package graft

/** Dev probe: count runtime exchange reuse in a query's final plan. */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "x_ngram_jaccard"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println(s"PROBE reused=${"ReusedExchange".r.findAllIn(p).size} " +
      s"shuffles=${"(?<!Reused)(?<!Broadcast)Exchange ".r.findAllIn(p).size} " +
      s"scans=${"Scan parquet".r.findAllIn(p).size}")
    spark.stop()
  }
}
