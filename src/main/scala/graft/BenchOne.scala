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
  * steady state, not a filtered selection. */
object BenchOne {
  /** Locale-independent seconds formatting: Bench.forkedReps parses the
    * rep line with `([0-9.]+) s`, and a default-locale `%.3f` renders a
    * comma decimal on e.g. de_DE, silently breaking every fork (the
    * same rule Bench pins for its JSON line — Double.toString only). */
  private def fmt(dt: Double): String = (math.rint(dt * 1000) / 1000).toString

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSessions.local(cpus)
    val fn = SparkEntry.queries(name)
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
    // printed — the consumer sees the full distribution and takes the
    // median over ALL recorded reps, so this widens the evidence on a
    // noisy run rather than selecting flattering measurements.
    val minReps = sys.env.getOrElse("GRAFT_REPS", "1").toInt
    val maxReps = sys.env.getOrElse("GRAFT_MAX_REPS", minReps.toString).toInt
    val spreadTol = sys.env.getOrElse("GRAFT_EXTRA_ON_SPREAD", "0").toDouble
    var times = Vector.empty[Double]
    var i = 0
    val gcBetweenReps = !sys.env.contains("GRAFT_NO_REP_GC")
    while (i < minReps || (i < maxReps && spreadTol > 0 && times.nonEmpty &&
        times.max / times.min > spreadTol)) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"[bench-one] $name rep${i + 1} rows=$n ${fmt(dt)} s")
      times :+= dt
      i += 1
      if (gcBetweenReps) System.gc()
    }
    spark.stop()
  }
}
