package graft
/** Single-query timing + plan dump: `runMain graft.BenchOne <name> <sfDir>`.
  * Env knobs: `GRAFT_REPS` timed repetitions (default 1), `GRAFT_MAX_REPS`
  * + `GRAFT_EXTRA_ON_SPREAD` outlier extension (see the timed loop),
  * `GRAFT_WARMUP` minimum untimed warmup repetitions before the timed
  * ones (default 0), `GRAFT_MAX_WARMUP` adaptive-warmup cap (default =
  * GRAFT_WARMUP), `GRAFT_SHOW` to print the result table,
  * `GRAFT_EXPLAIN` to dump the formatted plan first. [[Bench]] forks this
  * main in a fresh JVM for its heavy queries — the machine-parseable
  * `[bench-one] <name> rep<i> rows=<n> <sec> s` line format is its
  * contract, so keep it stable (warmup lines use a distinct `warmup<i>`
  * tag precisely so the rep parser never matches them).
  *
  * Warmup is ADAPTIVE (JMH-style steady-state): when GRAFT_MAX_WARMUP >
  * GRAFT_WARMUP, warmup reps continue until two consecutive ones agree
  * within 1.25×, so C2-compilation drift is absorbed by the warmup phase
  * instead of contaminating rep1. All warmup times are printed for
  * transparency — the timed reps are every measurement taken after
  * steady state, not a filtered selection.
  *
  * Each timed rep additionally carries the steal-retime rule (see the
  * rep loop): a rep window with heavy host steal is re-measured once
  * and the quieter window kept, the discarded attempt printed as a
  * `drop<i>` line the rep parser ignores. */
object BenchOne {
  /** Locale-independent seconds formatting: Bench.forkedReps parses the
    * rep line with `([0-9.]+) s`, and a default-locale `%.3f` renders a
    * comma decimal on e.g. de_DE, silently breaking every fork (the
    * same rule Bench pins for its JSON line — Double.toString only). */
  private def fmt(dt: Double): String = (math.rint(dt * 1000) / 1000).toString

  /** Machine-speed calibration probe: a fixed single-thread arithmetic
    * loop (~0.1-0.2 s on a quiet host). This host is a shared VM —
    * measured: the SAME pure-CPU work varies 1.7× run-to-run even with
    * the guest idle (host CPU steal / frequency sharing; guest thread
    * "CPU time" silently includes host preemption, so the inflation
    * shows up as real compute). Running the probe right after each rep
    * timestamps how fast the machine was DURING that window, letting the
    * consumer ([[Bench.forkedReps]]) median over reps taken on a quiet
    * machine instead of blending steal bursts into the recorded number.
    * All reps remain printed/recorded — the probe annotates, it never
    * hides. */
  @volatile private var calSink = 0L
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var i = 0L; var x = 0L
    while (i < 300000000L) { x += i * i; i += 1 }
    calSink = x
    (System.nanoTime() - t0) / 1e9
  }

  /** Sampled before/after each rep; the delta brackets the whole rep
    * window, catching bursts the post-rep calibration probe can miss. */
  private def stealSeconds(): Double = graft.util.HostProbe.stealSeconds()

  /** Cumulative JVM GC seconds (all collectors) — sampled before/after
    * each rep; the delta separates "the machine was slow" (cal/steal)
    * from "this JVM was collecting" (a major GC landing inside a rep). */
  private def gcSeconds(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum / 1000.0
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSessions.local(cpus)
    val fn = SparkEntry.queries(name)
    // GRAFT_JOBLOG=1: per-Spark-job wall durations, for attributing
    // rep-to-rep spread to a specific stage of a multi-job query.
    if (sys.env.contains("GRAFT_JOBLOG"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(js.jobId, System.nanoTime())
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = starts.remove(je.jobId)
            if (t0 != 0L)
              println(f"[job] id=${je.jobId} ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (for {
              s <- si.submissionTime; c <- si.completionTime
            } yield (c - s) / 1e3).getOrElse(-1.0)
            if (wall > 0.5)
              println(f"[stage] id=${si.stageId} tasks=${si.numTasks} wall=$wall%.3f s " +
                f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.3f s " +
                f"run=${si.taskMetrics.executorRunTime / 1e3}%.3f s " +
                f"gc=${si.taskMetrics.jvmGCTime / 1e3}%.3f s " +
                f"shufRead=${si.taskMetrics.shuffleReadMetrics.fetchWaitTime / 1e3}%.3f s " +
                f"shufWrite=${si.taskMetrics.shuffleWriteMetrics.writeTime / 1e9}%.3f s " +
                f"spill=${si.taskMetrics.memoryBytesSpilled / 1e6}%.1f MB " +
                s"name=${si.name}")
          }
        })
    if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    if (sys.env.contains("GRAFT_SHOW")) fn(spark, sfDir).show(100, false)
    val minWarm = sys.env.getOrElse("GRAFT_WARMUP", "0").toInt
    val maxWarm = sys.env.getOrElse("GRAFT_MAX_WARMUP", minWarm.toString).toInt
    var prev = -1.0
    var steady = false
    var w = 0
    while (w < minWarm || (w < maxWarm && !steady)) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"[bench-one] $name warmup${w + 1} ${fmt(dt)} s")
      steady = prev > 0 && dt <= prev * 1.25 && prev <= dt * 1.25
      prev = dt
      w += 1
      // the warmup's garbage must not land on rep1's heap
      System.gc()
    }
    // Timed reps, with OUTLIER EXTENSION: when the first GRAFT_REPS reps
    // disagree by more than GRAFT_EXTRA_ON_SPREAD (e.g. one rep caught a
    // major GC), keep measuring up to GRAFT_MAX_REPS. Every rep is
    // printed — the consumer (Bench) records the full distribution and
    // BOTH a median-over-all and a quiet-window median (cal/steal-based
    // selection with an order-stable tie-break), re-forking when the
    // two diverge — so this widens the evidence on a noisy run rather
    // than selecting flattering measurements.
    val minReps = sys.env.getOrElse("GRAFT_REPS", "1").toInt
    val maxReps = sys.env.getOrElse("GRAFT_MAX_REPS", minReps.toString).toInt
    val spreadTol = sys.env.getOrElse("GRAFT_EXTRA_ON_SPREAD", "0").toDouble
    var times = Vector.empty[Double]
    var steals = Vector.empty[Double]
    var i = 0
    val gcBetweenReps = !sys.env.contains("GRAFT_NO_REP_GC")
    calibrate(); calibrate() // JIT-warm the probe loop itself
    // Extension trigger 2, STEAL BURSTS: the consumer's quiet-window
    // median needs >= 3 reps under ~1 s of host steal to mean anything;
    // a sustained-contention window can dirty the whole initial pool
    // (r12 measured all 3 reps of one row at 2.8/15.1/7.6 s of steal).
    // Extending widens the chance of catching a quiet window; if the
    // machine stays loud to maxReps, every rep is recorded dirty and
    // the steal column says so.
    val wantClean = math.min(3, minReps)
    def cleanReps = steals.count(s => s >= 0 && s <= 1.0)
    def stealKnown = steals.nonEmpty && steals.forall(_ >= 0)
    // Per-rep steal retime (the ladder's timedQuiet rule, ported): a
    // rep whose window carried host steal above max(10% of wall, 0.5 s)
    // is re-measured ONCE and the QUIETER-window attempt is kept (the
    // smaller steal — never the faster time, so genuine slowdowns on a
    // quiet machine survive). Safe here, unlike single-shot ladder
    // rungs with cache-populating bodies: reps are repeated executions
    // in one JVM, so any session cache was already populated by warmup/
    // rep1 and both attempts see identical state. The discarded attempt
    // prints as a `drop` line (the Bench parser matches only `rep\\d`),
    // so the evidence stays in the fork log without entering the rep
    // pool. Disable with GRAFT_NO_STEAL_RETIME.
    val retimeOnSteal = !sys.env.contains("GRAFT_NO_STEAL_RETIME")
    def measure(): (Long, Double, Double, Double) = {
      val s0 = stealSeconds()
      val g0 = gcSeconds()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val steal = { val s1 = stealSeconds(); if (s0 < 0 || s1 < 0) -1.0 else s1 - s0 }
      (n, dt, steal, gcSeconds() - g0)
    }
    while (i < minReps || (i < maxReps && spreadTol > 0 &&
        ((times.nonEmpty && times.max / times.min > spreadTol) ||
          (stealKnown && cleanReps < wantClean)))) {
      var (n, dt, steal, gc) = measure()
      if (retimeOnSteal && steal > math.max(0.1 * dt, 0.5)) {
        println(s"[bench-one] $name drop${i + 1} rows=$n ${fmt(dt)} s " +
          s"steal=${fmt(steal)} gc=${fmt(gc)} — retiming once")
        if (gcBetweenReps) System.gc()
        val (n2, dt2, steal2, gc2) = measure()
        if (steal2 >= 0 && steal2 < steal) {
          n = n2; dt = dt2; steal = steal2; gc = gc2
        } else
          println(s"[bench-one] $name drop${i + 1}b rows=$n2 ${fmt(dt2)} s " +
            s"steal=${fmt(steal2)} gc=${fmt(gc2)} — retime stayed louder, " +
            "keeping the first window")
      }
      val cal = calibrate()
      println(s"[bench-one] $name rep${i + 1} rows=$n ${fmt(dt)} s " +
        s"cal=${fmt(cal)} steal=${fmt(steal)} gc=${fmt(gc)}")
      times :+= dt
      steals :+= steal
      i += 1
      if (gcBetweenReps) System.gc()
    }
    spark.stop()
  }
}
