package graft.stream

import graft.SparkSpecBase

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Watermarked streaming window semantics: windows finalize in append
  * mode once the watermark passes, and too-late events are dropped —
  * the bounded-state argument of EventRollup's scaladoc, observed. */
class EventRollupSpec extends SparkSpecBase {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("windows emit once finalized by the watermark; late events are dropped") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val rollup = EventRollup.windowed(
      input.toDF().toDF("ts", "event_type"), "ts", "event_type",
      windowLength = "1 hour", watermarkDelay = "30 minutes")
    val query = rollup.writeStream
      .format("memory").queryName("rollup_test").outputMode("append").start()
    try {
      // three events in the 10:00 window, one in 11:00
      input.addData(ts("10:05") -> "click", ts("10:10") -> "click",
        ts("10:40") -> "view", ts("11:10") -> "click")
      query.processAllAvailable()
      // watermark = 11:10 - 30min = 10:40 < 11:00 → nothing finalized yet
      assert(spark.table("rollup_test").count() === 0)

      // an event at 12:00 advances the watermark to 11:30 → the 10:00
      // window (end 11:00) finalizes and emits
      input.addData(ts("12:00") -> "view")
      query.processAllAvailable()
      val emitted = spark.table("rollup_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(emitted === Set(
        (ts("10:00"), "click", 2L),
        (ts("10:00"), "view", 1L)))

      // a LATE event for the already-finalized 10:00 window is dropped:
      // advancing the watermark further emits the 11:00 window without
      // any correction row for 10:00
      input.addData(ts("10:20") -> "click", ts("13:00") -> "view")
      query.processAllAvailable()
      val after = spark.table("rollup_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(after.contains((ts("11:00"), "click", 1L)))
      assert(after.count(_._1 == ts("10:00")) === 2) // unchanged — late data dropped
    } finally query.stop()
  }
}
