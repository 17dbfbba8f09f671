package graft.stream

import graft.SparkSpecBase

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** flatMapGroupsWithState sessionization: gap-close within a batch,
  * timeout-close via the watermark, per-key isolation, bounded state. */
class StreamSessionizeSpec extends SparkSpecBase {

  test("streaming sessions close on gap and on watermark timeout, exactly once") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val input = MemoryStream[(Long, Long)] // (user_id, epoch ms)
    val events = input.toDS()
      .map { case (u, t) => StreamSessionize.SessionEvent(u, new java.sql.Timestamp(t)) }
      .withWatermark("ts", "0 seconds")
    val out = StreamSessionize.sessions(events, gapMs = 10000L)
    val q = out.writeStream.format("memory").queryName("graft_sessions")
      .outputMode("append").start()
    try {
      def rows(): Set[(Long, Long, Long, Long, Long)] =
        spark.table("graft_sessions").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet

      // batch 1: an open session per key, nothing closes
      input.addData((1L, 1000L), (1L, 2000L), (2L, 1000L))
      q.processAllAvailable()
      assert(rows() === Set.empty)

      // batch 2: uid1's 48s gap closes its first session in-batch, and
      // the watermark jump to 50s fires uid2's 11s idle timeout in the
      // no-data follow-up batch Spark runs when the watermark advances
      input.addData((1L, 50000L))
      q.processAllAvailable()
      assert(rows() === Set(
        (1L, 1L, 2L, 1000L, 2000L),
        (2L, 1L, 1L, 1000L, 1000L)))

      // batch 3: watermark 61s passes uid1's open-session timeout (60s);
      // uid3's fresh session stays open — exactly-once, no re-emission
      input.addData((3L, 61000L))
      q.processAllAvailable()
      assert(rows() === Set(
        (1L, 1L, 2L, 1000L, 2000L),
        (2L, 1L, 1L, 1000L, 1000L),
        (1L, 2L, 1L, 50000L, 50000L)))

      // uid2 returns after its timeout-close: numbering must CONTINUE
      // (session 2, not a duplicate session 1) — the id-continuity
      // sentinel at work; its 70s gap from 61s watermark closes at 81s
      input.addData((2L, 70000L))
      q.processAllAvailable()
      input.addData((3L, 81000L))
      q.processAllAvailable()
      assert(rows() === Set(
        (1L, 1L, 2L, 1000L, 2000L),
        (2L, 1L, 1L, 1000L, 1000L),
        (1L, 2L, 1L, 50000L, 50000L),
        (2L, 2L, 1L, 70000L, 70000L),
        (3L, 1L, 1L, 61000L, 61000L))) // uid3 s1 closed once watermark hit 81s
    } finally q.stop()
  }
}
