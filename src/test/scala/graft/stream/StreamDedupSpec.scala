package graft.stream

import graft.SparkSpecBase

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Watermark-bounded streaming exact dedup: first occurrence survives,
  * in-horizon copies drop, post-horizon copies pass (bounded state). */
class StreamDedupSpec extends SparkSpecBase {

  test("first occurrence survives; in-horizon duplicates drop across batches") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val input = MemoryStream[(Long, Long, String)] // (doc_id, epoch ms, text)
    val docs = input.toDF().toDF("doc_id", "ms", "text")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_millis($"ms")).drop("ms")
    val out = StreamDedup.exactWithinWatermark(docs, "text", "ts", "10 seconds")
    val q = out.writeStream.format("memory").queryName("graft_sdedup")
      .outputMode("append").start()
    try {
      def ids(): Set[Long] =
        spark.table("graft_sdedup").select("doc_id").collect()
          .map(_.getLong(0)).toSet

      // batch 1: two distinct texts + one in-batch duplicate
      input.addData((1L, 1000L, "alpha"), (2L, 1000L, "beta"), (3L, 2000L, "alpha"))
      q.processAllAvailable()
      assert(ids() === Set(1L, 2L))

      // batch 2: a cross-batch duplicate within the horizon drops, a new
      // text passes
      input.addData((4L, 3000L, "alpha"), (5L, 3000L, "gamma"))
      q.processAllAvailable()
      assert(ids() === Set(1L, 2L, 5L))

      // batch 3: advance event time far past the 10s horizon — the old
      // digests are evicted from the state store, so a LATE re-occurrence
      // of "alpha" is a fresh first occurrence (the documented contract:
      // cross-horizon dedup belongs to the batch operator)
      input.addData((6L, 60000L, "delta"))
      q.processAllAvailable()
      input.addData((7L, 61000L, "alpha"))
      q.processAllAvailable()
      assert(ids() === Set(1L, 2L, 5L, 6L, 7L))
    } finally q.stop()
  }
}
