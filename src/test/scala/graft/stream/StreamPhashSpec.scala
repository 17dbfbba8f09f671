package graft.stream

import graft.SparkSpecBase
import graft.ext.{IncrementalSimHash, Multimodal}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** Streaming image dedup e2e: a shard's near-copy of an EARLIER
  * shard's image is caught (the append landed between triggers), and a
  * replayed epoch reads the pre-batch index byte-identically. */
class StreamPhashSpec extends SparkSpecBase {

  // dup-fixture blobs: id and id-5 (id ≡ 5 mod 10) are near-copies
  private def blobRows(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    Multimodal.synthesizeImagesWithDups(spark, ids.toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
  }

  test("cross-shard near-copies caught; replay reads the pre-batch index") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val idx = Files.createTempDirectory("sph-idx").toString
    // base index: image 10 (the future near-copy target is id 15)
    IncrementalSimHash.writeIndexFingerprints(
      Multimodal.imagePhash(spark,
        Multimodal.synthesizeImagesWithDups(spark,
          Seq(10L).toDF("doc_id"), "doc_id"), "doc_id", "blob"),
      "doc_id", "phash", idx, maxHamming = 3, blockPartitions = 4)

    val out = Files.createTempDirectory("sph-out").toString
    val ckpt = Files.createTempDirectory("sph-ckpt").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamPhash.start(input.toDF().toDF("doc_id", "blob"),
      idx, out, ckpt)
    try {
      // shard 1: unrelated image 2 (vs indexed 10: no pair expected)
      input.addData(blobRows(Seq(2L)): _*)
      q.processAllAvailable()
      // shard 2: id 15 = planted near-copy of indexed id 10
      input.addData(blobRows(Seq(15L)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 15L)),
      s"expected exactly the planted cross-shard pair, got $got")

    // crashed-after-append replay of b1: own-epoch exclusion must
    // reproduce the same single pair
    val fps = Multimodal.imagePhash(spark,
      Multimodal.synthesizeImagesWithDups(spark,
        Seq(15L).toDF("doc_id"), "doc_id"), "doc_id", "blob")
    val replay = IncrementalSimHash.nearDupPairsFingerprints(spark, idx,
        fps, "doc_id", "phash", excludeEpochs = Seq("b1"))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay === Set((10L, 15L)))
  }
}
