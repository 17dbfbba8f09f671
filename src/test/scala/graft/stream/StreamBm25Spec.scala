package graft.stream

import graft.SparkSpecBase
import graft.ext.{Bm25, IncrementalBm25}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming fold→serve e2e for the BM25 index: every snapshot must
  * equal the direct full recompute over everything ingested so far,
  * and a replayed epoch must land byte-identical. */
class StreamBm25Spec extends SparkSpecBase {

  private val Q = Seq("spark", "hash")

  test("each snapshot equals the direct topK over corpus-so-far") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val base = Seq((1L, "spark hash join"), (2L, "hash hash table scan"),
      (3L, "plain words only")).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("sbm-idx").toString
    IncrementalBm25.writeIndex(base, "doc_id", "text", idx, termBuckets = 8)

    val out = Files.createTempDirectory("sbm-out").toString
    val ckpt = Files.createTempDirectory("sbm-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamBm25.start(input.toDF().toDF("doc_id", "text"),
      idx, Q, k = 10, out, ckpt)
    val shard1 = Seq((10L, "spark spark stream"), (11L, "window sort"))
    val shard2 = Seq((20L, "hash spark merge"))
    try {
      input.addData(shard1: _*)
      q.processAllAvailable()
      input.addData(shard2: _*)
      q.processAllAvailable()
    } finally q.stop()

    def direct(docs: Seq[(Long, String)]) =
      Bm25.topK(docs.toDF("doc_id", "text"), "doc_id", "text", Q, 10)
        .select("doc_id", "n_terms", "score_u", "rank")
        .collect().map(_.toString).toSeq

    val baseRows = Seq((1L, "spark hash join"), (2L, "hash hash table scan"),
      (3L, "plain words only"))
    val snap = (e: String) => spark.read.parquet(s"$out/__epoch=$e")
      .select("doc_id", "n_terms", "score_u", "rank")
      .orderBy("rank").collect().map(_.toString).toSeq
    assert(snap("b0") === direct(baseRows ++ shard1))
    assert(snap("b1") === direct(baseRows ++ shard1 ++ shard2))
  }

  test("replayed epoch re-folds idempotently and re-serves byte-identical") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "spark hash join")).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("sbm-idx2").toString
    IncrementalBm25.writeIndex(base, "doc_id", "text", idx, termBuckets = 8)
    val shard = Seq((10L, "spark stream"), (11L, "hash probe"))
      .toDF("doc_id", "text")
    // simulate the crash-then-replay: fold the same epoch twice, serve
    // after each — index state and snapshot must be identical
    IncrementalBm25.appendToIndex(shard, "doc_id", "text", idx, "b7")
    val first = IncrementalBm25.search(spark, idx, Q, 10)
      .collect().map(_.toString).toSeq
    IncrementalBm25.appendToIndex(shard, "doc_id", "text", idx, "b7")
    val second = IncrementalBm25.search(spark, idx, Q, 10)
      .collect().map(_.toString).toSeq
    assert(first === second)
    // and equals the direct recompute over base ∪ shard
    val all = Seq((1L, "spark hash join"), (10L, "spark stream"),
      (11L, "hash probe")).toDF("doc_id", "text")
    assert(second.sorted ===
      Bm25.topK(all, "doc_id", "text", Q, 10)
        .collect().map(_.toString).toSeq.sorted)
  }
}
