package graft

/** The bench artifact must be self-adjudicating: failures are named,
  * never recorded as a plausible-looking time (r10 shipped 5 broken
  * queries with bogus-fast times and no marker), and every timing
  * carries process-CPU seconds so host contention (cpu ≪ wall) is
  * distinguishable from a plan regression without a re-run.
  */
class BenchSpec extends SparkSpec {

  test("a deliberately broken query surfaces as err, not a time") {
    val r = Bench.timeQuery("broken", () => throw new IllegalStateException("boom"))
    assert(r.err.contains("IllegalStateException"))
  }

  test("a working query records wall and cpu seconds, no err") {
    val r = Bench.timeQuery("ok", () => { Tables.region(spark, sfDir).count(); () })
    assert(r.err.isEmpty)
    assert(r.wall > 0.0)
    assert(r.cpu >= 0.0, "process CPU time unavailable — contention adjudication broken")
  }

  test("a query that strands a cache is flagged leaked; a clean one is not") {
    val leaky = Bench.timeQueryChecked(spark, "leaky", () => {
      val df = Tables.region(spark, sfDir).persist()
      df.count(); () // persisted, never released
    })
    assert(leaky.leaked > 0, "stranded cache not detected")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val clean = Bench.timeQueryChecked(spark, "clean", () => {
      val df = Tables.region(spark, sfDir).persist()
      try { df.count(); () } finally df.unpersist()
    })
    assert(clean.leaked == 0, s"clean query flagged as leaking ${clean.leaked}")
    // a transient localCheckpoint registers too, but drains via the
    // ContextCleaner once the frame is dropped — must NOT be flagged
    val transient = Bench.timeQueryChecked(spark, "transient", () => {
      Tables.region(spark, sfDir).localCheckpoint(true).count(); ()
    })
    assert(transient.leaked == 0,
      s"ContextCleaner-reclaimable checkpoint flagged as leak (${transient.leaked})")
  }

  test("a GC-heavy query records gc seconds; gc never exceeds wall") {
    // allocate hard enough to force at least one young-gen collection —
    // retry the burst a few times because a single pass can land inside
    // an already-charged collection window
    def burst(): Unit = {
      var sink = 0L
      var i = 0
      while (i < 40) { sink += new Array[Byte](32 << 20).length; i += 1 }
      assert(sink > 0)
    }
    var r = Bench.timeQuery("gc_heavy", burst _)
    var tries = 0
    while (r.gc <= 0.0 && tries < 5) { r = Bench.timeQuery("gc_heavy", burst _); tries += 1 }
    assert(r.gc > 0.0, "GC-heavy allocation burst recorded zero gc_sec")
    assert(r.gc <= r.wall + 0.5, s"gc ${r.gc} implausibly exceeds wall ${r.wall}")
  }
}
