package graft

/** Dev utility: time a single SparkEntry query.
  * Usage: runMain graft.BenchOne <queryName> [sfDir] [cpus]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val fn = SparkEntry.queries(name)
    // warm (plan + JIT) on the smallest SF, then measure
    fn(spark, "/root/testdata/sf0.001").count()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"BENCH_ONE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
