package graft.stream

import graft.SparkSpecBase
import graft.ext.IncrementalSemDedup

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming judge→append e2e for SemDeDup: shard 2's verdicts must see
  * shard 1's vectors (the append landed before the next trigger). */
class StreamSemDedupSpec extends SparkSpecBase {

  test("each shard is judged against all prior ingest, then joins the index") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val base = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("ssem-idx").toString
    IncrementalSemDedup.writeIndex(base, "vec_id", "embedding", idx,
      nCells = 2)

    val out = Files.createTempDirectory("ssem-out").toString
    val ckpt = Files.createTempDirectory("ssem-ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamSemDedup.start(input.toDF().toDF("vec_id", "embedding"),
      idx, out, ckpt, tau = 0.9)
    // shard 1: a fresh direction; shard 2: near-dup of shard 1's vector
    // (proves the append was visible) and a near-dup of the base corpus
    try {
      // leans toward the base c2 centroid (a pure third axis would tie
      // at dot 0 with every centroid and later near-dups could split
      // cells)
      input.addData((10L, Seq(0f, 0.02f, 0.99f, 0f)))
      q.processAllAvailable()
      input.addData((20L, Seq(0f, 0.03f, 0.98f, 0f)),
        (21L, Seq(0.99f, 0.01f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .select("vec_id", "kept")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(10L -> true, 20L -> false, 21L -> false))
  }
}
