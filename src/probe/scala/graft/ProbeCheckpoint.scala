package graft

/** Dev probe (r10 verdict #3): does cutting the `gated` lineage in
  * capstone v2 with `localCheckpoint` beat recomputing the PII-regex +
  * Gopher chain in its three consuming subtrees? Two interleaved
  * measured passes per variant, per-variant MIN, at the given SF.
  * Usage: runMain graft.ProbeCheckpoint [sfDir] [passes]
  */
object ProbeCheckpoint {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    def run(mode: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.queries.OpsQueries.pipelineCorpusV2(spark, sfDir, mode)
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      sec
    }
    val modes = Seq("lazy", "localCheckpoint", "persist")
    // unmeasured warm pass per plan shape (codegen + JIT + file listing)
    modes.foreach(run)
    val times = (1 to passes).map(_ => modes.map(m => m -> run(m)))
    val mins = modes.map(m => m -> times.flatten.filter(_._1 == m).map(_._2).min)
    println(f"PROBE_CHECKPOINT sf=$sfDir " +
      mins.map { case (m, v) => f"${m}_min=$v%.3f" }.mkString(" ") +
      " all=" + times.map(_.map { case (m, v) => f"$m=$v%.2f" }.mkString(",")).mkString(" "))
    spark.stop()
  }
}
