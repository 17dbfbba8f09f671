package graft.stream

import graft.SparkSpecBase

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join: in-window pairs emit, out-of-window
  * pairs don't, and rows far behind the watermark produce no late
  * output (the bounded-state eviction contract). */
class StreamIntervalJoinSpec extends SparkSpecBase {

  test("in-window matches emit once; stale rows beyond the watermark never match") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val clicks = MemoryStream[(Long, Long)] // (user, epoch ms)
    val views = MemoryStream[(Long, Long)]
    val cl = clicks.toDS().toDF("cu", "cms")
      .select(col("cu"), timestamp_millis(col("cms")).as("click_ts"))
    val vw = views.toDS().toDF("vu", "vms")
      .select(col("vu"), timestamp_millis(col("vms")).as("view_ts"))
    val joined = StreamIntervalJoin.backwardWithin(cl, vw,
      "cu", "vu", "click_ts", "view_ts",
      delayThreshold = "0 seconds", lookback = expr("INTERVAL 10 SECONDS"))
    val q = joined
      .select(col("cu"), unix_millis(col("click_ts")).as("ct"),
        unix_millis(col("view_ts")).as("vt"))
      .writeStream.format("memory").queryName("graft_ssjoin")
      .outputMode("append").start()
    try {
      def rows(): Set[(Long, Long, Long)] =
        spark.table("graft_ssjoin").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      // view at 5s, clicks at 10s (in window) and 16s (out: 11s gap);
      // user 2's click has no view at all
      views.addData((1L, 5000L))
      clicks.addData((1L, 10000L), (1L, 16000L), (2L, 10000L))
      q.processAllAvailable()
      assert(rows() === Set((1L, 10000L, 5000L)))

      // both directions of the bound: equal timestamps match, a view
      // AFTER the click does not
      views.addData((3L, 20000L), (3L, 30000L))
      clicks.addData((3L, 20000L))
      q.processAllAvailable()
      assert(rows() === Set((1L, 10000L, 5000L), (3L, 20000L, 20000L)))

      // advance the watermark far ahead on both sides (to 100s)...
      views.addData((9L, 100000L))
      clicks.addData((9L, 200000L))
      q.processAllAvailable()
      // ...then replay a click at 12s — 88s behind the watermark. Its
      // in-window candidate (user 1's view at 5s) was evicted from
      // state long ago and the row itself is late → no output: the
      // bounded-state contract, observable
      clicks.addData((1L, 12000L))
      q.processAllAvailable()
      assert(rows() === Set((1L, 10000L, 5000L), (3L, 20000L, 20000L)))
    } finally q.stop()
  }

  test("left_outer emits the null-padded row only after the watermark closes its window") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val clicks = MemoryStream[(Long, Long)]
    val views = MemoryStream[(Long, Long)]
    val cl = clicks.toDS().toDF("cu", "cms")
      .select(col("cu"), timestamp_millis(col("cms")).as("click_ts"))
    val vw = views.toDS().toDF("vu", "vms")
      .select(col("vu"), timestamp_millis(col("vms")).as("view_ts"))
    val joined = StreamIntervalJoin.backwardWithin(cl, vw,
      "cu", "vu", "click_ts", "view_ts",
      delayThreshold = "0 seconds", lookback = expr("INTERVAL 10 SECONDS"),
      joinType = "left_outer")
    val q = joined
      .select(col("cu"), unix_millis(col("click_ts")).as("ct"),
        col("vu").isNull.as("unmatched"))
      .writeStream.format("memory").queryName("graft_ssjoin_outer")
      .outputMode("append").start()
    try {
      def rows(): Set[(Long, Long, Boolean)] =
        spark.table("graft_ssjoin_outer").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

      // a matched click emits immediately; an unmatched one does NOT —
      // a matching view could still arrive within its 10s window
      views.addData((1L, 5000L))
      clicks.addData((1L, 10000L), (2L, 10000L))
      q.processAllAvailable()
      assert(rows() === Set((1L, 10000L, false)))

      // watermark jumps past user 2's window (10s + lookback) → the
      // null-padded row materializes in the no-data follow-up batch
      views.addData((9L, 60000L))
      clicks.addData((9L, 60000L))
      q.processAllAvailable()
      assert(rows() === Set((1L, 10000L, false), (9L, 60000L, false),
        (2L, 10000L, true)))
    } finally q.stop()
  }
}
