package graft

/** r17 probe (r16 verdict #4): adjudicate x_cluster_best_rep's executed
  * plan — the one expensive non-capstone query that had never been
  * plan-certified. Prints the post-AQE plan's structural skeleton
  * (scans / exchanges / aggregates / joins), its normalized hash, and
  * wall/cpu, at the bench SF.
  *
  * Usage: sbt "Test/runMain graft.ProbeR17BestRep [query...]"
  */
object ProbeR17BestRep {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("x_cluster_best_rep")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString()
      println(f"== $name rows=$rows sec=$sec%.2f plan_hash=${Bench.planHash(df)}")
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Aggregate") || l.contains("Join") || l.contains("Window") ||
          l.contains("TakeOrdered"))
        .foreach(l => println("   " + l.replaceAll("#\\d+[A-Za-z]*", "#_").take(160)))
    }
    spark.stop()
  }
}
