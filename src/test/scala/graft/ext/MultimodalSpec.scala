package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Multimodal plumbing over REAL JDK codecs: ImageIO PNG/BMP encode →
  * header probe / raster decode / bilinear resize, and
  * javax.sound.sampled WAV write → header parse. Video frame sampling
  * stays a disclosed byte-slicing stub (no JDK video codec). The
  * Spark-side contract — codec work inside mapPartitions, blob-pruned
  * metadata, deterministic fixtures — is asserted here. */
class MultimodalSpec extends SparkSpecBase {

  test("synthesized PNG and BMP bytes decode back to the fixture metadata") {
    val s = spark; import s.implicits._
    val ids = Seq(0L, 1L, 2L, 33L, 497L).toDF("doc_id")
    val blobs = Multimodal.synthesizeImages(spark, ids, "doc_id")
    val out = Multimodal.decodeMeta(spark, blobs, "doc_id", "blob")
      .orderBy("doc_id").collect()
    for (r <- out) {
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") === Multimodal.fixtureFormat(id))
      assert(r.getAs[Int]("width") === Multimodal.fixtureWidth(id))
      assert(r.getAs[Int]("height") === Multimodal.fixtureHeight(id))
      assert(r.getAs[Long]("n_bytes") > 0L)
    }
  }

  test("decodeMeta on unrecognisable, empty, or corrupt bytes yields empty format and zero dims") {
    val s = spark; import s.implicits._
    // a recognised PNG magic with a truncated header makes the reader
    // THROW (not return null) — the degrade contract must absorb that
    val truncatedPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n',
      0x1a, '\n', 0, 0)
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array.empty[Byte]),
      (3L, truncatedPng)).toDF("id", "blob")
    val out = Multimodal.decodeMeta(spark, df, "id", "blob").orderBy("id").collect()
    assert(out.length === 3)
    assert(out.forall(r => r.getAs[String]("format") === "" &&
      r.getAs[Int]("width") === 0 && r.getAs[Int]("height") === 0))
    // same contract on the full-raster paths: zeros, not a failed stage
    val sums = Multimodal.imageChannelSums(spark, df, "id", "blob")
      .orderBy("id").collect()
    assert(sums.forall(r => r.getAs[Long]("n_pixels") === 0L))
  }

  test("imageChannelSums round-trips the pixel formula exactly for both codecs") {
    val s = spark; import s.implicits._
    val ids = Seq(4L, 7L) // one png, one bmp
    val blobs = Multimodal.synthesizeImages(spark, ids.toDF("doc_id"), "doc_id")
    val out = Multimodal.imageChannelSums(spark, blobs, "doc_id", "blob")
      .orderBy("doc_id").collect()
    for ((id, r) <- ids.sorted.zip(out)) {
      val (w, h) = (Multimodal.fixtureWidth(id), Multimodal.fixtureHeight(id))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.pixelValue(id, x, y)
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      }
      assert(r.getAs[Long]("n_pixels") === w.toLong * h)
      assert(r.getAs[Long]("sum_r") === sr)
      assert(r.getAs[Long]("sum_g") === sg)
      assert(r.getAs[Long]("sum_b") === sb)
    }
  }

  test("resizeImages produces decodable PNGs at the target size, deterministically") {
    val s = spark; import s.implicits._
    val ids = Seq(10L, 11L).toDF("doc_id")
    val blobs = Multimodal.synthesizeImages(spark, ids, "doc_id")
    def run() = Multimodal.imageChecksums(spark,
      Multimodal.resizeImages(spark, blobs, "doc_id", "blob", 16, 12),
      "doc_id", "blob_resized").orderBy("doc_id").collect()
    val a = run(); val b = run()
    for (r <- a) {
      assert(r.getAs[Int]("width") === 16)
      assert(r.getAs[Int]("height") === 12)
      assert(r.getAs[Long]("checksum") !== 0L)
    }
    assert(a.map(_.getAs[Long]("checksum")).toSeq ===
      b.map(_.getAs[Long]("checksum")).toSeq)
  }

  test("synthesized WAV bytes parse back to the fixture audio metadata") {
    val s = spark; import s.implicits._
    val ids = Seq(0L, 42L, 199L).toDF("doc_id")
    val wavs = Multimodal.synthesizeWavs(spark, ids, "doc_id")
    val out = Multimodal.audioMeta(spark, wavs, "doc_id", "blob")
      .orderBy("doc_id").collect()
    for (r <- out) {
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") === "wave")
      assert(r.getAs[Int]("channels") === 1)
      assert(r.getAs[Long]("sample_rate") === 8000L)
      assert(r.getAs[Long]("n_frames") === 800L + (id % 100) * 8)
      assert(r.getAs[Long]("duration_ms") === 100L + id % 100)
    }
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

  test("synthesized AVI bytes parse back to the fixture video metadata") {
    val s = spark; import s.implicits._
    val ids = Seq(0L, 1L, 7L, 13L, 100L).toDF("doc_id")
    val avis = Multimodal.synthesizeAvis(spark, ids, "doc_id")
    val out = Multimodal.videoMeta(spark, avis, "doc_id", "blob")
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("container") === "avi")
      assert(r.getAs[Int]("width") === Multimodal.fixtureVideoWidth(id))
      assert(r.getAs[Int]("height") === Multimodal.fixtureVideoHeight(id))
      assert(r.getAs[Long]("n_frames") === Multimodal.fixtureVideoFrames(id).toLong)
      // the demuxed movi chunk count must agree with the header
      assert(r.getAs[Long]("n_frames_demuxed") === r.getAs[Long]("n_frames"))
      assert(r.getAs[Long]("duration_ms") ===
        Multimodal.fixtureVideoFrames(id).toLong * 40L)
    }
  }

  test("demuxAviFrames round-trips every frame payload byte-exactly") {
    for (id <- Seq(0L, 5L, 42L)) {
      val n = Multimodal.fixtureVideoFrames(id)
      val avi = Multimodal.synthesizeAvi(id,
        Multimodal.fixtureVideoWidth(id), Multimodal.fixtureVideoHeight(id), n)
      val frames = Multimodal.demuxAviFrames(avi)
      assert(frames.length === n)
      for (f <- 0 until n)
        assert(frames(f).toSeq === Multimodal.videoFramePayload(id, f).toSeq,
          s"payload mismatch id=$id frame=$f")
    }
    assert(Multimodal.demuxAviFrames("garbage".getBytes) === Nil)
  }

  test("parseAviMeta degrades on garbage, truncation, and non-AVI RIFF") {
    val Bad = ("", 0, 0, 0L, 0L, 0L)
    assert(Multimodal.parseAviMeta(null) === Bad)
    assert(Multimodal.parseAviMeta(Array.empty[Byte]) === Bad)
    assert(Multimodal.parseAviMeta("not a riff file at all".getBytes) === Bad)
    // valid RIFF magic but a WAVE form type — not an AVI
    val wav = Multimodal.synthesizeWav(1L, 100)
    assert(Multimodal.parseAviMeta(wav) === Bad)
    // truncated mid-header: degrade, don't throw
    val avi = Multimodal.synthesizeAvi(5L, 16, 12, 4)
    assert(Multimodal.parseAviMeta(avi.take(20)) === Bad)
    // corrupt chunk size (huge): parser must stop cleanly
    val corrupt = avi.clone()
    corrupt(16) = 0xff.toByte; corrupt(17) = 0xff.toByte
    corrupt(18) = 0xff.toByte; corrupt(19) = 0xff.toByte
    Multimodal.parseAviMeta(corrupt) // no throw is the assertion
  }

  test("synthesized MP4 bytes parse back to the fixture metadata, mdat cross-checked") {
    val s = spark; import s.implicits._
    val ids = Seq(0L, 1L, 7L, 13L, 100L).toDF("doc_id")
    val mp4s = Multimodal.synthesizeMp4s(spark, ids, "doc_id")
    val out = Multimodal.mp4Meta(spark, mp4s, "doc_id", "blob")
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = Multimodal.fixtureVideoFrames(id).toLong
      assert(r.getAs[String]("brand") === "isom")
      assert(r.getAs[Long]("timescale") === 1000L)
      assert(r.getAs[Long]("duration_ms") === n * 40L)
      assert(r.getAs[Long]("n_tracks") === 1L)
      assert(r.getAs[Int]("width") === Multimodal.fixtureVideoWidth(id))
      assert(r.getAs[Int]("height") === Multimodal.fixtureVideoHeight(id))
      assert(r.getAs[Long]("n_samples") === n)
      // header-vs-content: stsz count × fixed sample size == mdat bytes
      assert(r.getAs[Long]("mdat_bytes") === n * Multimodal.VideoFrameBytes)
    }
  }

  test("parseMp4Meta handles largesize and to-EOF boxes, degrades on garbage") {
    val Bad = ("", 0L, 0L, 0L, 0, 0, 0L, 0L)
    assert(Multimodal.parseMp4Meta(null) === Bad)
    assert(Multimodal.parseMp4Meta(Array.empty[Byte]) === Bad)
    assert(Multimodal.parseMp4Meta("not an iso bmff file".getBytes) === Bad)
    // an AVI is not ISO-BMFF (RIFF sizes read as absurd BE box sizes)
    assert(Multimodal.parseMp4Meta(Multimodal.synthesizeAvi(1L, 16, 12, 4)) === Bad)
    val mp4 = Multimodal.synthesizeMp4(5L, 16, 12, 4)
    assert(Multimodal.parseMp4Meta(mp4.take(30)) === Bad) // truncated: no moov
    // rewrite the trailing mdat's header to the 64-bit largesize form:
    // size=1 + fourcc + u64 largesize (grows the box header by 8)
    val mdatOff = mp4.length - (8 + 4 * Multimodal.VideoFrameBytes)
    assert(new String(mp4, mdatOff + 4, 4, "US-ASCII") === "mdat")
    val big = new java.io.ByteArrayOutputStream()
    big.write(mp4, 0, mdatOff)
    big.write(Array[Byte](0, 0, 0, 1)) // size = 1 ⇒ largesize follows
    big.write("mdat".getBytes("US-ASCII"))
    val payloadLen = 4 * Multimodal.VideoFrameBytes
    val largesize = 16L + payloadLen
    (56 to 0 by -8).foreach(s => big.write(((largesize >> s) & 0xff).toInt))
    big.write(mp4, mdatOff + 8, payloadLen)
    val parsedBig = Multimodal.parseMp4Meta(big.toByteArray)
    assert(parsedBig._8 === payloadLen.toLong, "largesize mdat payload length")
    assert(parsedBig._7 === 4L)
    // to-EOF form: size = 0 on the trailing mdat
    val eof = mp4.clone()
    eof(mdatOff) = 0; eof(mdatOff + 1) = 0; eof(mdatOff + 2) = 0; eof(mdatOff + 3) = 0
    assert(Multimodal.parseMp4Meta(eof)._8 === payloadLen.toLong)
    // corrupt box size: stop cleanly, no throw
    val corrupt = mp4.clone()
    corrupt(0) = 0x7f.toByte
    Multimodal.parseMp4Meta(corrupt)
  }

  test("demuxMp4Samples round-trips every sample payload byte-exactly") {
    for (id <- Seq(0L, 5L, 42L)) {
      val n = Multimodal.fixtureVideoFrames(id)
      val mp4 = Multimodal.synthesizeMp4(id,
        Multimodal.fixtureVideoWidth(id), Multimodal.fixtureVideoHeight(id), n)
      val samples = Multimodal.demuxMp4Samples(mp4)
      assert(samples.length === n)
      for (f <- 0 until n)
        assert(samples(f).toSeq === Multimodal.videoFramePayload(id, f).toSeq,
          s"payload mismatch id=$id sample=$f")
    }
    assert(Multimodal.demuxMp4Samples("garbage".getBytes) === Nil)
    // a chunk offset past EOF must degrade, not slice garbage or throw
    val mp4 = Multimodal.synthesizeMp4(5L, 16, 12, 4)
    val corrupt = mp4.clone()
    // find the stco box and bump its single chunk offset past EOF
    val stcoAt = (0 until mp4.length - 4)
      .find(i => new String(mp4, i, 4, "US-ASCII") == "stco").get
    corrupt(stcoAt + 12) = 0x7f.toByte // chunk_offset[0] high byte
    assert(Multimodal.demuxMp4Samples(corrupt) === Nil)
  }

  test("format sniffer routes real containers and degrades on junk") {
    assert(Multimodal.sniffFormat(
      Multimodal.synthesizeImage(3L, 8, 8, "png")) === "png")
    assert(Multimodal.sniffFormat(
      Multimodal.synthesizeImage(3L, 8, 8, "bmp")) === "bmp")
    assert(Multimodal.sniffFormat(Multimodal.synthesizeWav(3L, 16)) === "wav")
    assert(Multimodal.sniffFormat(
      Multimodal.synthesizeAvi(3L, 16, 12, 2)) === "avi")
    assert(Multimodal.sniffFormat(
      Multimodal.synthesizeMp4(3L, 16, 12, 2)) === "mp4")
    assert(Multimodal.sniffFormat(Array[Byte]()) === "empty")
    assert(Multimodal.sniffFormat(null) === "empty")
    assert(Multimodal.sniffFormat("not a container".getBytes) === "unknown")
    // truncated magics must not crash or false-positive
    assert(Multimodal.sniffFormat(Array[Byte](0x89.toByte, 'P')) === "unknown")
    assert(Multimodal.sniffFormat("RIFF".getBytes) === "unknown")
  }

  test("audio sample sums decode every 16-bit PCM sample exactly") {
    val s = spark; import s.implicits._
    val n = 48
    val wav = Multimodal.synthesizeWav(9L, n)
    val df = Seq((9L, wav), (10L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob")
    val got = Multimodal.audioSampleSums(spark, df, "doc_id", "blob")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val samples = (0 until n).map(i => (9L * 31 + i * 7) % 65536 - 32768)
    assert(got(9L) === ((n.toLong, samples.sum, samples.map(math.abs(_)).sum)))
    assert(got(10L) === ((0L, 0L, 0L)), "garbage must degrade, not fail")
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
