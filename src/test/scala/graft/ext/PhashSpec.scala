package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Perceptual image hash: planted near-copies are all recovered, the
  * blocked pigeonhole join equals the all-pairs truth on the fixture,
  * and the candidate plan never degenerates to a product join. */
class PhashSpec extends SparkSpecBase {
  import spark.implicits._

  private def ids(n: Long) = spark.range(n).withColumnRenamed("id", "doc_id")

  private def hashes(n: Long) = Multimodal.imagePhash(spark,
    Multimodal.synthesizeImagesWithDups(spark, ids(n), "doc_id"),
    "doc_id", "blob")

  test("every planted near-copy pair is recovered") {
    val got = Multimodal.phashNearDups(hashes(300), "doc_id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (5L until 300L by 10L).map(i => (i - 5, i)).toSet
    assert(planted.subsetOf(got),
      s"missing planted pairs: ${(planted -- got).take(5)}")
  }

  test("blocked join equals brute-force all-pairs inside the radius") {
    val h = hashes(200).collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- h; (b, hb) <- h if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.phashNearDups(hashes(200), "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
  }

  test("identical rasters hash identically across formats") {
    // even id -> png, odd -> bmp; same pixels must give the same hash
    val png = Multimodal.synthesizeImage(7L, 12, 10, "png")
    val bmp = Multimodal.synthesizeImage(7L, 12, 10, "bmp")
    val df = Seq((1L, png), (2L, bmp)).toDF("doc_id", "blob")
    val hs = Multimodal.imagePhash(spark, df, "doc_id", "blob")
      .select("phash").as[Long].collect()
    assert(hs(0) === hs(1))
  }

  test("candidate join is keyed, never a product") {
    val df = Multimodal.phashNearDups(hashes(100), "doc_id", 3)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"product join in:\n$p")
  }

  test("radius above the pigeonhole guarantee is rejected") {
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(hashes(10), "doc_id", maxHamming = 4)
    }
  }

  test("undecodable blobs are flagged and never pair as near-dups") {
    // two corrupt blobs plus an all-dark (but VALID) image: before the
    // decoded flag, all three hashed to 0 and reported each other as
    // Hamming-0 duplicates — a false-positive dedup that would drop
    // valid documents at scale
    val dark = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, Array[Byte](1, 2, 3)),          // corrupt
      (2L, "not an image".getBytes("UTF-8")), // corrupt
      (3L, dark)                            // valid, hashes to 0
    ).toDF("doc_id", "blob")
    val hs = Multimodal.imagePhash(spark, df, "doc_id", "blob")
    val flags = hs.select("doc_id", "decoded").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(flags === Map(1L -> false, 2L -> false, 3L -> true))
    val pairs = Multimodal.phashNearDups(hs, "doc_id", maxHamming = 3)
      .collect()
    assert(pairs.isEmpty,
      s"corrupt blobs must not join the near-dup candidates: ${pairs.toSeq}")
  }
}
