package graft.stream

import graft.SparkSpecBase
import graft.ext.{IncrementalLineDedup, LineDedup}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming flag→append e2e for line dedup: shard 2's rewrite must see
  * shard 1's line frequencies (the append landed before the next
  * trigger), and the final report must equal the full-recompute
  * restriction over everything ingested. */
class StreamLineDedupSpec extends SparkSpecBase {

  test("each shard's rewrite sees all prior ingest, then joins the index") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val base = Seq((1L, "nav bar\nbase article"),
      (2L, "plain unshared words")).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("sld-idx").toString
    IncrementalLineDedup.writeIndex(base, "doc_id", "text", idx, lineW = 0)

    val out = Files.createTempDirectory("sld-out").toString
    val ckpt = Files.createTempDirectory("sld-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamLineDedup.start(input.toDF().toDF("doc_id", "text"),
      idx, out, ckpt, sep = "\n")
    val shard1 = Seq((10L, "fresh banner\nshard one body"))
    // doc 20 repeats shard 1's banner, doc 21 the base nav bar
    val shard2 = Seq((20L, "fresh banner\nshard two body"),
      (21L, "nav bar\nanother body"))
    try {
      input.addData(shard1: _*)
      q.processAllAvailable()
      input.addData(shard2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .select("doc_id", "text", "n_dropped")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (10L, "fresh banner\nshard one body", 0L), // nothing hot yet
      (20L, "shard two body", 1L),
      (21L, "another body", 1L)))

    // final state == batch recompute over everything, restricted to the
    // last shard
    val all = (Seq((1L, "nav bar\nbase article"),
      (2L, "plain unshared words")) ++ shard1 ++ shard2)
      .toDF("doc_id", "text")
    val expect = LineDedup.dropBoilerplate(all, "doc_id", "text",
        LineDedup.lines(all, "doc_id", "text"), minDocs = 2, sep = "\n")
      .where(col("doc_id") >= 20L)
      .select("doc_id", "text", "n_dropped")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.filter(_._1 >= 20L) === expect)
  }

  test("replay: a re-run epoch reads the pre-batch index and rewrites its own rows") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "hot line\nbase text")).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("sld-idx2").toString
    IncrementalLineDedup.writeIndex(base, "doc_id", "text", idx, lineW = 0)
    val batch = Seq((10L, "hot line\nbatch text")).toDF("doc_id", "text")
    // simulate the crashed-after-append replay: epoch already present
    IncrementalLineDedup.appendToIndex(batch, "doc_id", "text", idx, "b0")
    val a = IncrementalLineDedup.dropBoilerplate(spark, idx, batch,
        "doc_id", "text", sep = "\n", excludeEpochs = Seq("b0"))
      .collect().map(_.toString).toSeq
    val b = IncrementalLineDedup.dropBoilerplate(spark, idx, batch,
        "doc_id", "text", sep = "\n", excludeEpochs = Seq("b0"))
      .collect().map(_.toString).toSeq
    assert(a === b)
    // the hot line drops regardless (base + batch = 2 docs); the batch's
    // OWN text must not be double-counted via its indexed copy
    assert(a.head.contains("batch text") && !a.head.contains("hot line"))
  }
}
