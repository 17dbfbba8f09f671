package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Multimodal plumbing: the codecs are stubs (none exist in this
  * environment) but the Spark-side contract — header decode inside
  * mapPartitions, blob slicing for frame sampling, blob-pruned metadata —
  * is real and asserted here. */
class MultimodalSpec extends SparkSpecBase {

  private def header(w: Int, h: Int, pad: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + pad)
    bb.putInt(w).putInt(h)
    bb.array()
  }

  test("decodeMeta extracts width/height from the fixed header, n_bytes from the blob") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, header(640, 480, 100)),
      (2L, header(1920, 1080, 0)),
      (3L, Array[Byte](1, 2, 3)) // too short → (0, 0)
    ).toDF("id", "blob")
    val out = Multimodal.decodeMeta(spark, df, "id", "blob").orderBy("id").collect()
    assert(out(0).getAs[Int]("width") === 640)
    assert(out(0).getAs[Int]("height") === 480)
    assert(out(0).getAs[Long]("n_bytes") === 108L)
    assert(out(1).getAs[Int]("width") === 1920)
    assert(out(2).getAs[Int]("width") === 0)
  }

  test("sampleFrames yields n fixed-width evenly spaced windows per blob") {
    val s = spark; import s.implicits._
    val blob = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq((7L, blob)).toDF("id", "blob")
    val frames = Multimodal.sampleFrames(df, "id", "blob", n = 4, frameBytes = 16)
      .orderBy("frame_idx").collect()
    assert(frames.length === 4)
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1, 2, 3))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length === 16))
    // first frame starts at the blob head; later frames advance
    assert(frames(0).getAs[Array[Byte]]("frame_bytes")(0) === 0.toByte)
    assert(frames(3).getAs[Array[Byte]]("frame_bytes")(0) !== 0.toByte)
  }

  test("resizeStub rewrites the header and bounds the payload; decode round-trips") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, header(640, 480, 1000)), // large payload → capped at 4*4=16
      (2L, header(8, 8, 4)),        // small payload → kept whole
      (3L, Array[Byte](1, 2))       // shorter than a header → empty payload
    ).toDF("id", "blob")
    val resized = Multimodal.resizeStub(spark, df, "id", "blob", 4, 4)
    val meta = Multimodal.decodeMeta(spark, resized, "id", "blob_resized")
      .orderBy("id").collect()
    assert(meta.forall(r => r.getAs[Int]("width") === 4 && r.getAs[Int]("height") === 4))
    assert(meta(0).getAs[Long]("n_bytes") === 8L + 16L)
    assert(meta(1).getAs[Long]("n_bytes") === 8L + 4L)
    assert(meta(2).getAs[Long]("n_bytes") === 8L)
  }

  test("fakeFeatures is deterministic and fixed-width") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "payload".getBytes), (2L, "payload".getBytes))
      .toDF("id", "blob")
    val out = df.select(Multimodal.fakeFeatures(col("blob"), dim = 8).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(out(0).length === 8)
    assert(out(0) === out(1)) // same content → same features
    assert(out(0).forall(v => v >= -1.0 && v <= 1.0))
  }
}
