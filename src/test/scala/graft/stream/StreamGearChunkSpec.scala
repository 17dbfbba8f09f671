package graft.stream

import graft.SparkSpecBase
import graft.ext.IncrementalGearChunk

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming gear-CDC e2e: a later shard re-shipping an earlier
  * shard's bytes dedups against the store built between triggers, and
  * a replayed epoch reads the pre-batch store (exactly-once-by-epoch). */
class StreamGearChunkSpec extends SparkSpecBase {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    var x = seed.toLong
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
  }

  test("cross-shard duplicate bytes dedup; replay reads the pre-batch store") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val idx = Files.createTempDirectory("sgc-idx").toString
    IncrementalGearChunk.writeIndex(
      Seq((1L, bytes(2000, 1))).toDF("doc_id", "blob"), "doc_id", "blob", idx)

    val out = Files.createTempDirectory("sgc-out").toString
    val ckpt = Files.createTempDirectory("sgc-ckpt").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamGearChunk.start(input.toDF().toDF("doc_id", "blob"),
      idx, out, ckpt)
    try {
      // shard 1: fresh bytes — all new vs the base store
      input.addData((10L, bytes(1500, 7)))
      q.processAllAvailable()
      // shard 2: re-ships shard 1's blob AND the base blob — all dup
      input.addData((20L, bytes(1500, 7)), (21L, bytes(2000, 1)))
      q.processAllAvailable()
      // shard 3: fresh bytes again (the replay probe below)
      input.addData((30L, bytes(1000, 99)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(out)
      .select("doc_id", "new_bytes", "dup_bytes")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(10L) === ((1500L, 0L)), s"shard-1 blob should be all new: $rows")
    assert(rows(20L) === ((0L, 1500L)), s"re-shipped shard-1 blob should be all dup: $rows")
    assert(rows(21L) === ((0L, 2000L)), s"re-shipped base blob should be all dup: $rows")
    assert(rows(30L) === ((1000L, 0L)),
      s"shard-3 fresh blob should be all new IN the stream (own-epoch " +
        s"exclusion — its append may land before the report is read): $rows")

    // crashed-after-append replay of the last micro-batch (epoch b2 —
    // MemoryStream batch ids start at 0; its append IS in the store):
    // excluding the batch's own epoch reproduces the pre-batch judgment
    def probe(exclude: Seq[String]) =
      IncrementalGearChunk.newBytes(spark, idx,
          Seq((30L, bytes(1000, 99))).toDF("doc_id", "blob"),
          "doc_id", "blob", excludeEpochs = exclude)
        .select("doc_id", "new_bytes", "dup_bytes")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(probe(Seq("b2"))(30L) === ((1000L, 0L)),
      "replay with own-epoch exclusion should see the pre-batch store")
    // and the exclusion is doing real work: without it the batch's own
    // appended digests shadow the judgment
    assert(probe(Nil)(30L) === ((0L, 1000L)),
      "without exclusion the batch's own append reports its bytes as dup")

    // the stream's appends are visible store-side: both batch epochs exist
    val epochs = spark.read.parquet(s"$idx/chunks")
      .select("__epoch").distinct().collect().map(_.getString(0)).toSet
    assert(epochs.contains("base") && epochs.exists(_.startsWith("b")),
      s"expected base + batch epochs, got $epochs")
  }
}
