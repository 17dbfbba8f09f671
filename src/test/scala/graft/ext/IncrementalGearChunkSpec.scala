package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IncrementalGearChunkSpec extends SparkSpecBase {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    var x = seed.toLong
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
  }

  private def blobDf(rows: (Long, Array[Byte])*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "blob")
  }

  private def account(df: DataFrame): Map[Long, (Long, Long, Long, Long, Long)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"),
        r.getAs[Long]("blob_bytes"), r.getAs[Long]("dup_bytes"),
        r.getAs[Long]("new_bytes"))).toMap

  test("newBytes: stored blob re-arriving is all-dup; fresh blob is all-new") {
    val dir = Files.createTempDirectory("graft-igc").toString
    val existing = blobDf(1L -> bytes(3000, 1), 2L -> bytes(800, 2))
    IncrementalGearChunk.writeIndex(existing, "doc_id", "blob", dir)
    val batch = blobDf(10L -> bytes(3000, 1), 11L -> bytes(2000, 9))
    val got = account(
      IncrementalGearChunk.newBytes(spark, dir, batch, "doc_id", "blob"))
    val (_, dup10, bytes10, dupB10, new10) = got(10L)
    assert(dupB10 === 3000L && new10 === 0L && bytes10 === 3000L)
    assert(dup10 > 0)
    val (_, dup11, _, dupB11, new11) = got(11L)
    assert(dup11 === 0L && dupB11 === 0L && new11 === 2000L)
  }

  test("shared prefix dedups content-defined: appended tail is the only new bytes (±one chunk)") {
    val dir = Files.createTempDirectory("graft-igc2").toString
    val base = bytes(4000, 5)
    IncrementalGearChunk.writeIndex(blobDf(1L -> base), "doc_id", "blob", dir)
    val extended = base ++ bytes(500, 6)
    val got = account(IncrementalGearChunk.newBytes(spark, dir,
      blobDf(20L -> extended), "doc_id", "blob"))
    val (_, _, total, dupB, newB) = got(20L)
    assert(total === 4500L)
    // everything except the appended tail plus at most the final
    // (re-cut) chunk of the base must dedup against the store
    assert(newB <= 500L + 256L, s"new_bytes $newB exceeds tail + one max chunk")
    assert(dupB >= 4500L - 500L - 256L)
  }

  test("appendToIndex folds a batch in; compact preserves the judgment") {
    val dir = Files.createTempDirectory("graft-igc3").toString
    IncrementalGearChunk.writeIndex(blobDf(1L -> bytes(1500, 3)),
      "doc_id", "blob", dir)
    val day1 = blobDf(30L -> bytes(2500, 4))
    IncrementalGearChunk.appendToIndex(day1, "doc_id", "blob", dir, "day1")
    // day1's blob re-arriving is now all-dup
    val before = account(IncrementalGearChunk.newBytes(spark, dir,
      blobDf(40L -> bytes(2500, 4)), "doc_id", "blob"))
    assert(before(40L)._5 === 0L)
    IncrementalGearChunk.compact(spark, dir)
    val after = account(IncrementalGearChunk.newBytes(spark, dir,
      blobDf(40L -> bytes(2500, 4)), "doc_id", "blob"))
    assert(after === before)
    // compaction folded epochs: only `base` remains
    val epochs = spark.read.parquet(s"$dir/chunks")
      .select("__epoch").distinct().collect().map(_.getString(0)).toSeq
    assert(epochs === Seq("base"))
  }

  test("store probe equals from-scratch recompute (the parity contract)") {
    val dir = Files.createTempDirectory("graft-igc4").toString
    val existing = blobDf(1L -> bytes(3000, 1), 2L -> bytes(800, 2),
      3L -> bytes(1200, 3))
    IncrementalGearChunk.writeIndex(existing, "doc_id", "blob", dir)
    val batch = blobDf(10L -> bytes(3000, 1), 11L -> bytes(2000, 9),
      12L -> (bytes(800, 2) ++ bytes(300, 11)))
    val inc = account(
      IncrementalGearChunk.newBytes(spark, dir, batch, "doc_id", "blob"))
    val storedDigests = GearChunk.chunks(existing, "doc_id", "blob")
      .select("chunk_sha256").distinct().withColumn("__dup", lit(true))
    val brute = account(GearChunk.chunks(batch, "doc_id", "blob")
      .join(storedDigests, Seq("chunk_sha256"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("__dup"), 1)).as("n_dup_chunks"),
        sum("chunk_bytes").as("blob_bytes"),
        coalesce(sum(when(col("__dup"), col("chunk_bytes"))), lit(0L))
          .as("dup_bytes"),
        coalesce(sum(when(col("__dup").isNull, col("chunk_bytes"))), lit(0L))
          .as("new_bytes")))
    assert(inc === brute)
  }
}
