package graft.stream

import graft.SparkSpecBase
import graft.ext.IncrementalDistinct

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming HLL distinct e2e: estimates grow exactly with genuinely
  * new values across triggers, repeats add nothing, and a replayed
  * epoch reads the pre-batch store. */
class StreamDistinctSpec extends SparkSpecBase {

  test("per-trigger all-time estimates; repeats add nothing; replay excludes own epoch") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val idx = Files.createTempDirectory("sdist-idx").toString
    // base store: users 0..49 of type "a"
    IncrementalDistinct.writeIndex(
      spark.range(50).select(lit("a").as("event_type"),
        col("id").as("user_id")),
      "event_type", "user_id", idx)

    val out = Files.createTempDirectory("sdist-out").toString
    val ckpt = Files.createTempDirectory("sdist-ckpt").toString
    val input = MemoryStream[(String, Long)]
    val q = StreamDistinct.start(
      input.toDF().toDF("event_type", "user_id"),
      idx, out, ckpt, "event_type", "user_id")
    try {
      // batch 0: 10 NEW users (50..59)
      input.addData((50L until 60L).map(u => ("a", u)): _*)
      q.processAllAvailable()
      // batch 1: all repeats — the estimate must not move
      input.addData((0L until 60L).map(u => ("a", u)): _*)
      q.processAllAvailable()
    } finally q.stop()

    def est(epoch: String): Long =
      spark.read.parquet(s"$out/__epoch=$epoch")
        .collect().head.getAs[Long]("distinct_est")
    // at this cardinality (60 « 2^12 registers) HLL is exact
    assert(est("b0") === 60L, s"batch 0 estimate: ${est("b0")}")
    assert(est("b1") === 60L, s"repeats moved the estimate: ${est("b1")}")

    // replayed b0 excludes its own epoch — but b1's sketches exist, so
    // the exclusion-does-work probe is on the LAST epoch:
    val replay = IncrementalDistinct.estimate(spark, idx,
        spark.range(1).select(lit("a").as("event_type"),
          lit(999L).as("user_id")),
        "event_type", "user_id", excludeEpochs = Seq("b0", "b1"))
      .collect().head.getAs[Long]("distinct_est")
    // pre-stream store (50 users) + the probe value 999 = 51
    assert(replay === 51L,
      s"replay excluding both stream epochs should see the base store: $replay")
  }
}
