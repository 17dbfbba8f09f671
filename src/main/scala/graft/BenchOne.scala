package graft
/** Single-query timing + plan dump: `runMain graft.BenchOne <name> <sfDir>`.
  * Env knobs: `GRAFT_REPS` timed repetitions (default 1), `GRAFT_WARMUP`
  * untimed warmup repetitions before the timed ones (default 0),
  * `GRAFT_EXPLAIN` to dump the formatted plan first. [[Bench]] forks this
  * main in a fresh JVM for its heavy queries — the machine-parseable
  * `[bench-one] <name> rep<i> rows=<n> <sec> s` line format is its
  * contract, so keep it stable. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSessions.local(cpus)
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    (1 to sys.env.getOrElse("GRAFT_WARMUP", "0").toInt).foreach { _ =>
      fn(spark, sfDir).count()
    }
    (1 to sys.env.getOrElse("GRAFT_REPS", "1").toInt).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[bench-one] $name rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      System.gc()
    }
    spark.stop()
  }
}
