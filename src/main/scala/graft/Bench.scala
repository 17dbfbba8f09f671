package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSessions.local(cpus)
    // Untimed warmup of the JSON/codegen hot paths: C2 compilation of the
    // parser loops costs 30-40s the first time a JSON-heavy plan runs and
    // lands on an arbitrary query otherwise (measured 45s cold vs 6s warm
    // for the same query).
    try SparkEntry.queries("cdc_materialize_debezium")(spark, sfDir)
      .limit(2000).count()
    catch { case _: Throwable => () }
    // Deterministic order + a GC break between queries: 29 queries share
    // one JVM, and accumulated shuffle/broadcast garbage otherwise makes
    // per-query times swing 3-5× run-to-run. A failed query records the
    // sentinel -1.0 (and logs) rather than masquerading as a fast run.
    def timed(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      if (ok) dt else -1.0
    }
    val first = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      (name, fn, timed(name, fn))
    }
    // Heavy-tail re-time: queries above 5s swing wildly in the shared
    // JVM (one LSH query measured 5.5-18.8s across reps on identical
    // code), which blinds round-over-round regression detection exactly
    // where it matters. Median-of-3 is robust to a single JIT/GC
    // resonance outlier in either direction; bounded extra cost (only
    // the heavy queries re-run). Failed reps (-1.0 sentinel) drop out of
    // the median; a query whose FIRST run failed stays failed.
    val results = first.map { case (name, fn, t) =>
      if (t > 5.0) {
        val reps = Seq(t, timed(name, fn), timed(name, fn)).filter(_ >= 0).sorted
        name -> (if (reps.isEmpty) -1.0 else reps(reps.size / 2))
      } else name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
