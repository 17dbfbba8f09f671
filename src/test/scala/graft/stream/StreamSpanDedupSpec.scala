package graft.stream

import graft.SparkSpecBase
import graft.ext.{IncrementalSpanDedup, SpanDedup}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming flag→append e2e for span dedup: shard 2's spans must see
  * shard 1's windows (the append landed before the next trigger), and
  * each shard's report must equal the full-recompute restriction over
  * everything ingested up to and including that shard. */
class StreamSpanDedupSpec extends SparkSpecBase {

  private val run = (1 to 20).map(i => s"s$i").mkString(" ")

  test("each shard's spans see all prior ingest, then join the index") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val base = Seq((1L, run), (2L, "plain unshared words")).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("ssd-idx").toString
    IncrementalSpanDedup.writeIndex(base, "doc_id", "text", idx, w = 12)

    val out = Files.createTempDirectory("ssd-out").toString
    val ckpt = Files.createTempDirectory("ssd-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamSpanDedup.start(input.toDF().toDF("doc_id", "text"),
      idx, out, ckpt)
    val fresh = (1 to 20).map(i => s"f$i").mkString(" ") // new in shard 1
    val shard1 = Seq((10L, s"$fresh trailing words"))
    val shard2 = Seq((20L, fresh), (21L, run)) // dup vs shard1 AND base
    try {
      input.addData(shard1: _*)
      q.processAllAvailable()
      input.addData(shard2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .select("doc_id", "span_start", "span_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // shard 1 introduced `fresh` — nothing to flag at its trigger
    // shard 2: doc 20 duplicates shard 1's fresh run, doc 21 the base run
    assert(got === Set((20L, 1L, 20L), (21L, 1L, 20L)))

    // and the final state equals the batch restricted recompute over
    // everything, for the last shard
    val all = (Seq((1L, run), (2L, "plain unshared words")) ++ shard1 ++
      shard2).toDF("doc_id", "text")
    val expect = SpanDedup.spans(all, "doc_id", "text", w = 12)
      .where(col("doc_id") >= 20L)
      .select("doc_id", "span_start", "span_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("replay: a re-run epoch reads the pre-batch index and rewrites its own rows") {
    val s = spark; import s.implicits._
    val base = Seq((1L, run)).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("ssd-idx2").toString
    IncrementalSpanDedup.writeIndex(base, "doc_id", "text", idx, w = 12)
    val batch = Seq((10L, run)).toDF("doc_id", "text")
    // simulate the crashed-after-append replay: epoch already present
    IncrementalSpanDedup.appendToIndex(batch, "doc_id", "text", idx, "b0")
    val replay = IncrementalSpanDedup.spans(spark, idx, batch,
      "doc_id", "text", excludeEpochs = Seq("b0"))
      .collect().map(_.toString).toSeq
    val firstRun = IncrementalSpanDedup.spans(spark, idx, batch,
      "doc_id", "text", excludeEpochs = Seq("b0"))
      .collect().map(_.toString).toSeq
    assert(replay === firstRun)
    // without the exclusion the batch would self-pair against its own
    // indexed copy at a count the contract never promises
    assert(replay.nonEmpty) // run duplicates base regardless
  }
}
