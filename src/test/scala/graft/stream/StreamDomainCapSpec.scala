package graft.stream

import graft.SparkSpecBase
import graft.ext.IncrementalDomainCap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming admit→append e2e for the domain cap: shard 2's admission
  * must see shard 1's budget consumption (the append landed before the
  * next trigger), and a replayed batch must rewrite byte-identical
  * rows against the pre-batch budget. */
class StreamDomainCapSpec extends SparkSpecBase {

  test("each shard's admission sees all prior ingest; budgets deplete in order") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val idx = Files.createTempDirectory("sdc-idx").toString
    IncrementalDomainCap.writeIndex(
      Seq((1L, "a.com"), (2L, "a.com")).toDF("doc_id", "domain"),
      "doc_id", "domain", idx, cap = 3, buckets = 8)

    val out = Files.createTempDirectory("sdc-out").toString
    val ckpt = Files.createTempDirectory("sdc-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamDomainCap.start(input.toDF().toDF("doc_id", "domain"),
      idx, out, ckpt)
    try {
      input.addData((10L, "a.com"), (11L, "b.org"))   // a.com takes its last slot
      q.processAllAvailable()
      input.addData((20L, "a.com"), (21L, "b.org"))   // a.com now full
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .select("doc_id", "admitted")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === Map(10L -> 1, 11L -> 1, 20L -> 0, 21L -> 1))

    // final index state equals the batch recompute over everything
    val total = spark.read.parquet(s"$idx/counts")
      .where(col("domain") === "a.com")
      .agg(sum("n_kept")).collect()(0).getLong(0)
    assert(total === 3L)
  }

  test("a replayed batch rewrites byte-identical report rows") {
    val s = spark
    import s.implicits._
    val idx = Files.createTempDirectory("sdc-idx2").toString
    IncrementalDomainCap.writeIndex(
      Seq((1L, "a.com")).toDF("doc_id", "domain"),
      "doc_id", "domain", idx, cap = 2, buckets = 8)
    val shard = Seq((10L, "a.com"), (11L, "a.com")).toDF("doc_id", "domain")
    // simulate the crash-after-append, before-checkpoint-commit replay:
    // the append has landed, then the batch runs again with the same id
    IncrementalDomainCap.appendToIndex(shard, "doc_id", "domain", idx, "b0")
    val replay = IncrementalDomainCap.admit(spark, idx, shard,
        "doc_id", "domain", excludeEpochs = Seq("b0"))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(replay === Map(10L -> 1, 11L -> 0)) // pre-batch budget: 1 slot
  }
}
