package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  case class QRun(name: String, wall: Double, cpu: Double, err: Option[String],
                  leaked: Int = 0, gc: Double = 0.0,
                  plan: String = "", inMb: Double = 0.0, shMb: Double = 0.0)

  private lazy val osBean = java.lang.management.ManagementFactory
    .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])

  /** Total stop-the-world collection time across every GC bean, in
    * seconds. Per-query deltas separate real work from allocation
    * churn: the r11 artifact carried a 7.13 s / 118 CPU-s minhash entry
    * whose CPU inflation was host-load + GC masquerading as compute —
    * with `gc_sec` next to `cpu_sec` the artifact distinguishes the
    * two without a judge re-run.
    */
  def gcTime(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
  }

  /** Executor-side read volume, summed across task ends: parquet/file
    * input bytes and shuffle-read bytes. The r15 failure class this
    * diagnoses: builder and driver artifacts disagreed 43× on one
    * query's CPU (19 vs 455 CPU-s, both passes slow, so the pass-spread
    * flag was blind) and nothing in either artifact could localize the
    * recomputation. Bytes read is the recompute fingerprint — a query
    * that re-derives a pinned input re-reads its parquet and re-shuffles
    * it, so a fast-vs-slow artifact diff shows WHERE the extra volume
    * went without a judge re-run.
    */
  private final class ReadVolume extends SparkListener {
    val input = new AtomicLong(0L)
    val shuffle = new AtomicLong(0L)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shuffle.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  /** Drain the async listener bus so per-query byte deltas don't bleed
    * into the next query's window. `LiveListenerBus.waitUntilEmpty` is
    * private[spark] (public in bytecode — reflection reaches it); if
    * the reflective path ever breaks, a bounded sleep keeps the deltas
    * approximately right rather than failing the bench.
    */
  private def drainListenerBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(50) }

  /** Structural fingerprint of the EXECUTED (post-AQE) physical plan:
    * run-varying tokens (expression ids, plan ids, codegen stage ids,
    * object addresses, filesystem paths) are normalized away so the
    * same plan hashes identically across sessions and hosts. Two
    * artifacts disagreeing on a query's cost while agreeing on its
    * plan_hash → environment; disagreeing on plan_hash → AQE/codegen
    * planned it differently, and the plans can be diffed offline.
    */
  def normalizePlan(raw: String): String = raw
    .replaceAll("#\\d+[A-Za-z]*", "#_")
    .replaceAll("plan_id=\\d+", "plan_id=_")
    .replaceAll("\\[id=#?_?\\d*\\]", "")
    .replaceAll("@[0-9a-fA-F]+", "@_")
    .replaceAll("0x[0-9a-fA-F]+", "0x_")
    // lambda variable names carry a session-global counter (x_13, y_6)
    .replaceAll("\\blambda ([A-Za-z]+)_\\d+", "lambda $1_")
    // JVM-assigned lambda CLASS indices (Multimodal$$Lambda$3775/0x…)
    // in object plans (MapPartitions/SerializeFromObject) depend on
    // global class-LOAD order: stable within a session, shifted across
    // rounds by ANY unrelated code change — exactly the r18→r19
    // media/warc-family hash churn the r19 verdict flagged (plans
    // identical, only the lambda index moved). Mask the counter so the
    // hash fingerprints the PLAN, not the classloader's history.
    .replaceAll("\\$\\$Lambda\\$\\d+",
      java.util.regex.Matcher.quoteReplacement("$$Lambda$_"))
    // URI-schemed and bare temp paths (DSv2 scratch dirs, artifact
    // caches) vary per session/host
    .replaceAll("([a-z][a-z0-9]*:)?/(tmp|var)/[^\\s,\\)\\]]+", "<path>")
    .replaceAll("(file|hdfs|s3a?|gs):[^\\s,\\)\\]]+", "<path>")
    .replaceAll("codegen id : \\d+", "codegen id : _")

  def planHash(df: DataFrame): String =
    try {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(normalizePlan(df.queryExecution.executedPlan.toString()).getBytes("UTF-8"))
      md.take(6).map(b => f"$b%02x").mkString
    } catch { case _: Throwable => "" }

  /** Time one query: wall seconds, process-CPU seconds, GC seconds, and
    * the exception class if it failed — never a silent bogus time.
    */
  def timeQuery(name: String, run: () => Unit): QRun = {
    val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime; val g0 = gcTime()
    val err = try { run(); None }
              catch { case e: Throwable => Some(e.getClass.getSimpleName) }
    QRun(name, (System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9, err,
      gc = gcTime() - g0)
  }

  /** [[timeQuery]] plus cache-leak detection: a query that leaves MORE
    * persisted RDDs registered than it found poisons every later
    * measurement in the session (r10's capstone leak made its own
    * pass-2 artificially warm, so min-of-2 reported the flattered
    * number). Transient `localCheckpoint` blocks also register but
    * drain via the ContextCleaner once the query's frame is dropped —
    * so when the raw diff is non-zero, GC-and-poll briefly and count
    * only what SURVIVES: a CacheManager pin can never be reclaimed, so
    * the survivors are true leaks, not lifecycle noise. The drain runs
    * outside the timed window; per-query wall/cpu are unaffected.
    */
  def timeQueryChecked(spark: org.apache.spark.sql.SparkSession,
                       name: String, run: () => Unit): QRun = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = timeQuery(name, run)
    r.copy(leaked = pollLeaks(spark, before))
  }

  /** Count the persisted RDDs that appeared since `before` and SURVIVE
    * a GC-and-poll drain — see [[timeQueryChecked]]. Callers must drop
    * every reference to the query's frames first: a live DataFrame
    * keeps its localCheckpoint blocks reachable, and the ContextCleaner
    * (correctly) refuses to reclaim them — they'd count as leaks here
    * while being ordinary lifecycle.
    */
  def pollLeaks(spark: org.apache.spark.sql.SparkSession,
                before: scala.collection.Set[Int]): Int = {
    def left() = spark.sparkContext.getPersistentRDDs.keySet.diff(before).size
    var n = left()
    val deadline = System.currentTimeMillis() + 5000
    while (n > 0 && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(100); n = left()
    }
    n
  }

  /** Classify one query's two measured passes. None = no flag (clean).
    * Some(kind) for a >3× wall spread above the 1 s floor:
    *   pass1-work — slow pass came FIRST and its extra wall was real
    *                compute with a MOVED fingerprint (extra bytes read
    *                or shuffled): an artifact/layout build, pay-once;
    *   wall-stall — extra wall with ~no extra CPU (host/IO stall;
    *                min-of-2 already reports the true cost);
    *   env-churn  — extra CPU on the FIRST pass while the executed-plan
    *                hash AND the input/shuffle byte deltas agree
    *                (within max(1 MB, 5%)): no extra data was read or
    *                moved, so the inflation is the JVM/host (GC
    *                threads, JIT recompilation, host steal all land in
    *                process CPU), not query compute. Automates the
    *                "bytes and plans identical ⇒ environment"
    *                adjudication PLANS.md applied by hand since r15.
    *                A real recompute normally cannot hide here —
    *                re-deriving an input re-reads and re-shuffles it,
    *                so its fingerprint moves.
    *   warm-churn — the same byte-identical shape but the slow pass
    *                came SECOND (ADVICE r18): a recompute from data
    *                already pinned in memory would also be pure CPU
    *                with an unmoved fingerprint, so this variant gets
    *                its own VISIBLE kind instead of folding into
    *                env-churn — a warm-churn that repeats on the same
    *                query across artifacts is a warm regression, not
    *                noise. Not actionable as a one-off: one of the
    *                five r17 driver-artifact flags
    *                (x_unigram_logprob 0.54→2.35 s) was exactly this
    *                shape and was hand-adjudicated JVM churn — gating
    *                on it would re-flag measured driver noise.
    *   pass2-work — extra compute on the SECOND pass with a moved
    *                fingerprint: warm recomputation or plan
    *                divergence — merits a look.
    */
  private[graft] def spreadKindOf(a: QRun, b: QRun): Option[String] = {
    val flagged = a.err.isEmpty && b.err.isEmpty &&
      math.max(a.wall, b.wall) > 1.0 &&
      math.max(a.wall, b.wall) > 3.0 * math.min(a.wall, b.wall)
    if (!flagged) None
    else {
      val (slow, fast) = if (a.wall >= b.wall) (a, b) else (b, a)
      def close(x: Double, y: Double) =
        (x - y).abs <= math.max(1.0, 0.05 * math.max(x, y))
      val sameData = slow.plan.nonEmpty && slow.plan == fast.plan &&
        close(slow.inMb, fast.inMb) && close(slow.shMb, fast.shMb)
      Some(
        if (slow.cpu - fast.cpu < 0.15 * (slow.wall - fast.wall)) "wall-stall"
        else if (sameData && (slow eq a)) "env-churn"
        else if (sameData) "warm-churn"
        else if (slow eq a) "pass1-work"
        else "pass2-work")
    }
  }

  private[graft] def isActionable(name: String, kind: String): Boolean =
    isActionable(name, kind, Set.empty)

  /** `priorWarmChurn`: queries the PREVIOUS artifact flagged
    * `warm-churn`. A one-off warm-churn is JVM churn and stays
    * non-actionable, but the same query flagging warm-churn in two
    * consecutive artifacts is a warm regression — cached-data
    * recompute, not environment (r18 ADVICE analysis; the escalation
    * was a by-hand convention until r19 ADVICE asked for it to gate).
    */
  private[graft] def isActionable(name: String, kind: String,
                                  priorWarmChurn: Set[String]): Boolean =
    kind == "pass2-work" ||
      (kind == "pass1-work" && !SparkEntry.expectedPass1Work.contains(name)) ||
      (kind == "warm-churn" && priorWarmChurn.contains(name))

  /** Names flagged `warm-churn` in a prior artifact's `spread_kind`
    * map, parsed from its JSON line (the artifact is hand-rolled JSON;
    * this reads the one flat string-to-string object back out).
    */
  private[graft] def warmChurnNames(artifactJson: String): Set[String] = {
    val obj = java.util.regex.Pattern.compile("\"spread_kind\":\\{([^}]*)\\}")
      .matcher(artifactJson)
    if (!obj.find()) Set.empty
    else {
      val pair = java.util.regex.Pattern
        .compile("\"([^\"]+)\":\"([^\"]+)\"").matcher(obj.group(1))
      val b = Set.newBuilder[String]
      while (pair.find()) if (pair.group(2) == "warm-churn") b += pair.group(1)
      b.result()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val volume = new ReadVolume
    spark.sparkContext.addSparkListener(volume)
    // Warm every query shape once at the smallest SF (parquet footer
    // reads, codegen, JIT) so the measured pass times the queries at
    // `sfDir`, not first-touch compilation; fixed name order makes runs
    // comparable.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }
    // ANN-family shared artifact build at the MEASURED SF, timed as its
    // own line item (r18 verdict #3): previously the train-once IVF-PQ
    // codebook + codes build landed inside whichever family member ran
    // first cold, so that query's per-pass numbers shifted round over
    // round. Prebuilding here makes every family member measure warm
    // and keeps the build cost visible as ann_artifact_build_sec.
    val annBuild = timeQuery("ann_artifact_build",
      () => graft.queries.OpsQueries.prebuildAnnArtifacts(spark, sfDir))
    // Process CPU time alongside wall time, per query: loadavg sampled
    // between passes missed r10's contention entirely (quiet samples,
    // 8× slow queries). cpu≈wall×parallelism means real work; a
    // multi-second wall with cpu ≪ wall is the contention fingerprint —
    // the artifact adjudicates itself without a judge re-run.
    // Two measured passes, per-query MIN: r6's bench ran on a contended
    // host and reported 70.3 s for a query that measures 2.3 s on a
    // quiet one (see PLANS.md "r6 bench anomaly") — min-of-2 absorbs
    // transient host contention without changing what is measured.
    def pass(): Seq[QRun] = ordered.map { case (name, fn) =>
      // A failed query must be LOUD in the artifact: r10 carried 5
      // broken queries with bogus-fast times and no marker. Record the
      // exception class; the headline counts errs. Leak-checked: a
      // stranded cache would silently warm every later measurement.
      // Plan hash + byte deltas are captured OUTSIDE the timed window,
      // and the frame reference is RELEASED before the leak poll — a
      // live DataFrame pins its localCheckpoint blocks, so polling with
      // it in scope would misreport ordinary lifecycle as leaks.
      val (i0, s0) = (volume.input.get, volume.shuffle.get)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      var df: DataFrame = null
      val r = timeQuery(name, () => { df = fn(spark, sfDir); df.count(); () })
      drainListenerBus(spark)
      val plan = if (df == null) "" else planHash(df)
      df = null
      r.copy(leaked = pollLeaks(spark, before), plan = plan,
        inMb = (volume.input.get - i0) / 1e6,
        shMb = (volume.shuffle.get - s0) / 1e6)
    }
    def loadavg(): Double =
      try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loads = scala.collection.mutable.ArrayBuffer(loadavg())
    val passes = Seq.fill(2) { val p = pass(); loads += loadavg(); p }
    // Per-query min wall, carrying the cpu of the faster pass; an error
    // in EITHER pass marks the query errored (its times are meaningless).
    val results = passes.head.zip(passes(1)).map { case (a, b) =>
      val best = if (a.wall <= b.wall) a else b
      best.copy(err = a.err.orElse(b.err), leaked = a.leaked + b.leaked)
    }
    val errs = results.filter(_.err.isDefined)
    val leaks = results.filter(_.leaked > 0)
    // Pass-spread adjudication (r14 verdict): a query whose passes
    // disagree >3× in wall time is recomputation/plan divergence or
    // host contention — either way the artifact must FLAG it instead
    // of silently reporting the flattering min. Sub-second queries are
    // exempt (JIT/GC jitter dominates below the measurement floor).
    val spread = passes.head.zip(passes(1)).collect {
      case (a, b) if spreadKindOf(a, b).isDefined =>
        a.name -> BigDecimal(math.max(a.wall, b.wall) / math.min(a.wall, b.wall))
          .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val spreadKind = passes.head.zip(passes(1))
      .flatMap { case (a, b) => spreadKindOf(a, b).map(a.name -> _) }
    // Actionable spread = flags minus the designed exceptions (r16
    // verdict #3), so a clean sweep is machine-checkable as 0:
    //   pass1-work on a query DECLARED in SparkEntry.expectedPass1Work
    //     — the designed pay-once artifact build; not actionable.
    //   wall-stall — extra wall with ~no extra CPU is the host, not the
    //     plan; min-of-2 already reports the true cost and the flag +
    //     kind stay visible above; not actionable for the builder.
    //   env-churn — identical plan + identical byte deltas, slow pass
    //     first: the environment, not the plan; kind stays visible.
    //   warm-churn — same byte-identical shape, slow pass SECOND: a
    //     one-off is JVM churn (the r17 x_unigram_logprob flag), but
    //     the distinct kind keeps it visible so a REPEAT on the same
    //     query across artifacts reads as a warm regression.
    //   everything else — undeclared pass-1 compute or ANY pass-2-work
    //     with a moved fingerprint (warm must never be slower) —
    //     actionable.
    // Prior artifact (read BEFORE this run overwrites it): a repeated
    // warm-churn on the same query across consecutive artifacts
    // promotes to actionable automatically (ADVICE r19) — the repeat
    // is the warm-regression fingerprint, a one-off is JVM churn.
    val priorArtifact = Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json"))
    val priorWarm =
      if (Files.exists(priorArtifact)) warmChurnNames(Files.readString(priorArtifact))
      else Set.empty[String]
    val actionable = spreadKind.filter { case (name, kind) =>
      isActionable(name, kind, priorWarm)
    }
    // 0.1 ms resolution keeps the JSON line short enough that log
    // capture never truncates the query map (r02's did at full
    // double precision).
    def r4(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    def qmap(vs: Seq[(String, Double)]): String =
      vs.map { case (k, v) => s"\"" + k + "\":" + r4(v) }.mkString("{", ",", "}")
    def qmapS(vs: Seq[(String, String)]): String =
      vs.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val ok = results.filter(_.err.isEmpty)
    val qs = qmap(results.map(r => r.name -> r.wall))
    val cpus = qmap(results.map(r => r.name -> r.cpu))
    val gcs = qmap(results.map(r => r.name -> r.gc))
    val total = ok.map(_.wall).sum
    val passesJson = passes.map(p => qmap(p.map(r => r.name -> r.wall))).mkString("[", ",", "]")
    // Self-diagnosis payload (one entry per pass): executed-plan
    // fingerprints and read volume. plan_hash equal across passes AND
    // artifacts + byte deltas equal ⇒ any cost gap is environment;
    // byte deltas diverging pins recomputation to the pass that read
    // more — the r15 both-passes-slow mode becomes localizable offline.
    val planJson = passes.map(p => qmapS(p.map(r => r.name -> r.plan))).mkString("[", ",", "]")
    val inMbJson = passes.map(p => qmap(p.map(r => r.name -> r.inMb))).mkString("[", ",", "]")
    val shMbJson = passes.map(p => qmap(p.map(r => r.name -> r.shMb))).mkString("[", ",", "]")
    val loadsJson = loads.map(r4).mkString("[", ",", "]")
    // a failed ANN prebuild must be LOUD (r19 review): the build cost
    // would otherwise land back inside the first family query with
    // ann_artifact_build_sec reading as a fast successful build
    val errPairs = errs.map(r => r.name -> r.err.get) ++
      annBuild.err.map(e => "ann_artifact_build" -> e)
    val nErrs = errPairs.length
    val errsJson = errPairs.map { case (n, e) => s"\"" + n + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val leaksJson = leaks.map(r => s"\"" + r.name + "\":" + r.leaked).mkString("{", ",", "}")
    val spreadJson = spread.map { case (n, x) => s"\"" + n + "\":" + x }.mkString("{", ",", "}")
    val spreadKindJson = qmapS(spreadKind)
    val actionableJson = qmapS(actionable)
    // Verdict-critical numbers in one SHORT line (r16 verdict #5): the
    // driver's capture can truncate the full artifact line (r16's
    // BENCH_r16.json parsed as null for exactly that reason), so the
    // headline — total / errs / leaks / the historically-unstable LSH
    // query's CPU / actionable spread — must also exist in a line no
    // capture window can cut. Printed LAST (r17 verdict #4: the
    // capture keeps the TAIL of stdout, so summary-first was truncated
    // away with the rest of the head); the full line (and the
    // authoritative file copy) carries the per-query detail.
    val lshCpu = results.find(_.name == "x_minhash_lsh_precision").map(_.cpu).getOrElse(-1.0)
    val summary = s"""{"metric":"total","value":${r4(total)},"unit":"sec","total":${r4(total)},"summary":true,"detail":"BENCH_out.json","n_queries":${results.length},"n_errs":$nErrs,"n_leaks":${leaks.length},"lsh_cpu_sec":${r4(lshCpu)},"n_spread_flagged":${spread.length},"n_spread_actionable":${actionable.length},"ann_artifact_build_sec":${r4(annBuild.wall)},"sf":"$sfDir"}"""
    val json = s"""{"metric":"total","value":${r4(total)},"unit":"sec","total":${r4(total)},"ann_artifact_build_sec":${r4(annBuild.wall)},"queries":$qs,"cpu_sec":$cpus,"gc_sec":$gcs,"n_errs":$nErrs,"errs":$errsJson,"n_leaks":${leaks.length},"leaks":$leaksJson,"n_spread_flagged":${spread.length},"spread_flagged":$spreadJson,"spread_kind":$spreadKindJson,"n_spread_actionable":${actionable.length},"spread_actionable":$actionableJson,"sf":"$sfDir","n_passes":${passes.length},"passes":$passesJson,"plan_hash":$planJson,"input_mb":$inMbJson,"shuffle_mb":$shMbJson,"loadavg_1m":$loadsJson}"""
    // The authoritative copy goes to a FILE — log capture truncated the
    // stdout tail in r02/r03, so round-over-round comparison must never
    // depend on the printed line surviving intact.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    println(summary)
    spark.stop()
  }
}
