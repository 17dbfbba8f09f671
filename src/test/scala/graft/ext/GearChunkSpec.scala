package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class GearChunkSpec extends SparkSpecBase {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    // deterministic pseudo-random content (content-defined boundaries
    // need entropy; constant bytes never hit the mask)
    var x = seed.toLong
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
  }

  test("boundaries partition the blob: contiguous, within [min,max], cover all bytes") {
    val b = bytes(5000, 7)
    val ends = GearChunk.boundaries(b, maskBits = 6, minSize = 16, maxSize = 256)
    assert(ends.last === b.length)
    assert(ends === ends.sorted && ends.distinct === ends)
    val lens = (0 +: ends).sliding(2).map { case Seq(a, e) => e - a }.toSeq
    // all but the final chunk obey the min clamp; all obey max
    assert(lens.dropRight(1).forall(_ >= 16), s"short non-final chunk in $lens")
    assert(lens.forall(_ <= 256), s"over-max chunk in $lens")
    assert(lens.sum === b.length)
  }

  test("empty blob yields no chunks; sub-min blob yields one final chunk") {
    assert(GearChunk.boundaries(Array.emptyByteArray, 6, 16, 256).isEmpty)
    assert(GearChunk.boundaries(bytes(5, 1), 6, 16, 256) === Seq(5))
  }

  test("shift resistance: one inserted byte realigns within a bounded prefix") {
    val b = bytes(8000, 42)
    val shifted = Array[Byte](99) ++ b
    def hashes(x: Array[Byte]) = {
      val ends = GearChunk.boundaries(x, 6, 16, 256)
      (0 +: ends).sliding(2).map { case Seq(a, e) =>
        x.slice(a, e).toSeq }.toSeq
    }
    val orig = hashes(b).toSet
    val moved = hashes(shifted)
    // fixed-size chunking would share ~0 chunks; CDC re-syncs after the
    // insertion point, so the majority of shifted chunks match exactly
    val shared = moved.count(orig.contains)
    assert(shared >= moved.length * 2 / 3,
      s"only $shared of ${moved.length} chunks realigned")
  }

  test("chunks table is deterministic across partitionings and round-trips") {
    val s = spark; import s.implicits._
    val df = Seq((1L, bytes(3000, 1)), (2L, bytes(700, 2)),
      (3L, Array.emptyByteArray), (4L, bytes(3000, 1)))
      .toDF("doc_id", "blob")
    def table(parts: Int) =
      GearChunk.chunks(df.repartition(parts), "doc_id", "blob")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).sortBy(t => (t._1, t._2))
    val a = table(2)
    assert(a === table(7))
    // identical blobs 1 and 4 share every chunk digest
    val d1 = a.filter(_._1 == 1L).map(_._5).toSeq
    val d4 = a.filter(_._1 == 4L).map(_._5).toSeq
    assert(d1 === d4 && d1.nonEmpty)
    // empty blob 3 contributes no rows
    assert(!a.exists(_._1 == 3L))
  }

  test("roundtrip row proves reassembly; dedupStats sees the planted duplicate") {
    val s = spark; import s.implicits._
    val df = Seq((1L, bytes(3000, 1)), (2L, bytes(700, 2)),
      (4L, bytes(3000, 1))).toDF("doc_id", "blob")
    val rt = GearChunk.roundtrip(df, "doc_id", "blob")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rt.forall(t => t._2 === t._3 && t._4 && t._5))
    val stats = GearChunk.dedupStats(
      GearChunk.chunks(df, "doc_id", "blob")).collect()(0)
    // blobs 1 and 4 are byte-identical → stored < logical by ~3000
    assert(stats.getAs[Long]("logical_bytes") === 6700L)
    assert(stats.getAs[Long]("stored_bytes") === 3700L)
    assert(stats.getAs[Long]("n_unique_chunks") < stats.getAs[Long]("n_chunks"))
  }
}
