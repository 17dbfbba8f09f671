package graft
/** Single-query timing + plan dump: `runMain graft.BenchOne <name> <sfDir>`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSessions.local(cpus)
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    (1 to sys.env.getOrElse("GRAFT_REPS", "1").toInt).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[bench-one] $name rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
