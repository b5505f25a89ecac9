package graft

/** r16 probe: why do ~47 queries' executed-plan fingerprints differ
  * between bench passes? Runs each named query twice in one session and
  * prints a unified-ish diff of the NORMALIZED plan strings — separates
  * genuine AQE divergence (a real finding the artifact should carry)
  * from normalization gaps (run-varying tokens the hash should strip).
  *
  * Usage: sbt "Test/runMain graft.ProbeR16Plan q1 q2 ..." [sfDir via env]
  */
object ProbeR16Plan {
  def normalize(raw: String): String = Bench.normalizePlan(raw)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def planOf(): String = {
        val df = fn(spark, sfDir); df.count()
        normalize(df.queryExecution.executedPlan.toString())
      }
      val p1 = planOf(); val p2 = planOf()
      if (p1 == p2) println(s"== $name: STABLE")
      else {
        println(s"== $name: DIVERGED")
        val l1 = p1.linesIterator.toVector; val l2 = p2.linesIterator.toVector
        val n = math.max(l1.size, l2.size)
        var shown = 0
        for (i <- 0 until n if shown < 30) {
          val a = l1.lift(i).getOrElse(""); val b = l2.lift(i).getOrElse("")
          if (a != b) { println(s"  p1[$i]: $a"); println(s"  p2[$i]: $b"); shown += 1 }
        }
      }
    }
    spark.stop()
  }
}
