package graft.stream

import graft.SparkSpecBase
import graft.ext.Decontamination

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming decontam e2e: MemoryStream shards flagged in-flight
  * against the persisted benchmark index must produce exactly the
  * batch report [[Decontamination.decontaminate]] computes directly. */
class StreamDecontamSpec extends SparkSpecBase {

  test("streamed shards are flagged in-flight, identical to the batch report") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (101L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val idx = Files.createTempDirectory("sdc-idx").toString
    Decontamination.writeIndex(bench, "doc_id", "text", idx, n = 8)

    val out = Files.createTempDirectory("sdc-out").toString
    val ckpt = Files.createTempDirectory("sdc-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamDecontam.start(
      input.toDF().toDF("doc_id", "text"), idx, out, ckpt)
    try {
      // shard 1: one contaminated (contains a full bench 8-gram), one clean
      input.addData(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota end"),
        (2L, "totally novel words nowhere near the benchmark suite text"))
      q.processAllAvailable()
      // shard 2: another hit + a too-short doc (no grams)
      input.addData(
        (3L, "prefix one two three four five six seven eight nine ten"),
        (4L, "short doc"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .select("doc_id", "n_grams", "n_hits", "contaminated")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val allDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota end"),
      (2L, "totally novel words nowhere near the benchmark suite text"),
      (3L, "prefix one two three four five six seven eight nine ten"),
      (4L, "short doc")).toDF("doc_id", "text")
    val direct = Decontamination.decontaminate(allDocs, bench,
        "doc_id", "text", n = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === direct)
    assert(got.exists { case (id, _, hits, c) => id == 1L && hits > 0 && c })
    assert(got.exists { case (id, _, hits, c) => id == 2L && hits == 0 && !c })
    assert(got.exists { case (id, g, _, c) => id == 4L && g == 0 && !c })

    // replay idempotency: an at-least-once redelivery of shard 2
    // (batch 1) re-runs the flag pass and overwrites its OWN epoch —
    // the report gains no duplicate rows
    val before = spark.read.parquet(out).count()
    Decontamination.flagAgainstIndex(spark, idx,
        Seq((3L, "prefix one two three four five six seven eight nine ten"),
          (4L, "short doc")).toDF("doc_id", "text"), "doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/__epoch=b1")
    assert(spark.read.parquet(out).count() === before)
  }
}
