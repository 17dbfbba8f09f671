package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import java.security.MessageDigest

/** Content-defined chunking (CDC) over binary blobs with a gear
  * rolling hash — the storage-dedup primitive for multimodal corpora:
  * chunk boundaries follow CONTENT, not offsets, so two blobs sharing
  * a long byte range (re-encoded crawl captures, appended archives,
  * near-identical images) share the chunks covering it even when the
  * range shifts position. Fixed-size chunking loses all sharing after
  * one inserted byte; gear CDC realigns within one chunk (the
  * shift-resistance property GearChunkSpec asserts).
  *
  * Kernel (public algorithm — the gear hash of FastCDC et al.):
  * `h = (h << 1) + GEAR(b)` per byte, boundary when
  * `(h & mask) == 0`, with [min,max] size clamps (no boundary before
  * `min`; forced boundary at `max`). The 256-entry gear table is
  * derived from splitmix64 so the chunking is deterministic across
  * JVMs, sessions, and engines — no seed state to persist.
  *
  * 100 TB design: the kernel is a single forward pass per blob inside
  * `mapPartitions` — blobs are never shuffled; only (id, offset, len,
  * chunk_sha256) rows cross the wire (~60 bytes per chunk), and the
  * downstream dedup (`groupBy chunk_hash`) shuffles fixed-width
  * digests. Reassembly integrity is proven IN the same pass
  * ([[roundtrip]]): sum/contiguity of chunk lens plus
  * sha256(concat chunks) == sha256(blob), so the gate costs no second
  * read of the blob bytes.
  */
object GearChunk {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic gear table: GEAR(i) = splitmix64(i). */
  private val Gear: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))

  /** Chunk END offsets (exclusive) for one blob: content-defined
    * boundaries with the [min,max] clamps; always ends at blob length
    * (the final chunk may be shorter than `min`). */
  def boundaries(bytes: Array[Byte], maskBits: Int, minSize: Int,
      maxSize: Int): Seq[Int] = {
    require(maskBits >= 1 && maskBits <= 30)
    require(minSize >= 1 && maxSize >= minSize)
    val mask = (1L << maskBits) - 1
    val ends = Seq.newBuilder[Int]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val sz = i - start + 1
      if ((sz >= minSize && (h & mask) == 0L) || sz >= maxSize) {
        ends += (i + 1); start = i + 1; h = 0L
      }
      i += 1
    }
    if (start < bytes.length) ends += bytes.length
    ends.result()
  }

  /** Ids feed a primitive-Long encoder below; a null would surface as
    * an opaque deserializer NPE at executor time. Fail loudly in-plan
    * instead (blobs, by contrast, are legitimately nullable and map to
    * zero chunks). */
  private def requiredId(idCol: String): org.apache.spark.sql.Column =
    when(col(idCol).isNull, raise_error(
      lit(s"GearChunk: null $idCol — blob ids must be non-null")).cast("long"))
      .otherwise(col(idCol).cast("long"))

  private def sha256Hex(bytes: Array[Byte], from: Int, len: Int): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(bytes, from, len)
    md.digest().map("%02x".format(_)).mkString
  }

  /** The chunk table: one row per chunk —
    * (id, chunk_idx, offset, chunk_bytes, chunk_sha256). Blobs stay
    * executor-local; empty blobs produce no rows. */
  def chunks(df: DataFrame, idCol: String, blobCol: String,
      maskBits: Int = 6, minSize: Int = 16, maxSize: Int = 256): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)
    df.select(requiredId(idCol), col(blobCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          val b = if (blob == null) Array.emptyByteArray else blob
          var prev = 0
          boundaries(b, maskBits, minSize, maxSize).iterator.zipWithIndex
            .map { case (end, idx) =>
              val off = prev; prev = end
              (id, idx.toLong, off.toLong, (end - off).toLong,
                sha256Hex(b, off, end - off))
            }
        }
      }(enc)
      .toDF(idCol, "chunk_idx", "offset", "chunk_bytes", "chunk_sha256")
  }

  /** Reassembly-integrity gate, computed in the SAME single pass over
    * each blob: chunk lens are contiguous and sum to the blob length,
    * and sha256 over the chunks in order equals sha256 of the blob.
    * Output (id, blob_bytes, sum_chunk_bytes, contiguous_ok,
    * reassembled_ok) — every column restatable live by an oracle that
    * only knows the blob lengths. */
  def roundtrip(df: DataFrame, idCol: String, blobCol: String,
      maskBits: Int = 6, minSize: Int = 16, maxSize: Int = 256): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaBoolean, Encoders.scalaBoolean)
    df.select(requiredId(idCol), col(blobCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val b = if (blob == null) Array.emptyByteArray else blob
          val ends = boundaries(b, maskBits, minSize, maxSize)
          val md = MessageDigest.getInstance("SHA-256")
          var prev = 0
          var sum = 0L
          var contiguous = true
          ends.foreach { end =>
            if (end <= prev || end > b.length) contiguous = false
            md.update(b, prev, end - prev)
            sum += end - prev
            prev = end
          }
          if (prev != b.length) contiguous = false
          val reasm = md.digest().toSeq == {
            val m2 = MessageDigest.getInstance("SHA-256")
            m2.update(b); m2.digest().toSeq
          }
          (id, b.length.toLong, sum, contiguous, reasm && sum == b.length)
        }
      }(enc)
      .toDF(idCol, "blob_bytes", "sum_chunk_bytes", "contiguous_ok",
        "reassembled_ok")
  }

  /** Corpus-level dedup accounting over a chunk table: unique chunks
    * by digest, stored vs logical bytes — one partial-aggregating
    * shuffle on the fixed-width digest, then a scalar roll-up. */
  def dedupStats(chunkTable: DataFrame): DataFrame =
    chunkTable.groupBy("chunk_sha256")
      .agg(count(lit(1)).as("refs"), max("chunk_bytes").as("chunk_bytes"))
      .agg(
        sum("refs").cast("long").as("n_chunks"),
        count(lit(1)).as("n_unique_chunks"),
        sum(col("refs") * col("chunk_bytes")).cast("long").as("logical_bytes"),
        sum("chunk_bytes").cast("long").as("stored_bytes"))
}
