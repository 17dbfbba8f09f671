package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal — the classic cheap junk detector
  * used alongside the Gopher/C4 heuristics: near-incompressible text is
  * usually minified markup, base64, or random noise; extremely
  * compressible text is boilerplate repetition — both get dropped or
  * down-weighted before training. Extension beyond the reference
  * (SURVEY.md §2.8 north star).
  *
  * The signal is DEFLATE (RFC 1951) output length over the UTF-8 bytes
  * at a FIXED level (BEST_COMPRESSION) and default strategy — a pure
  * per-document function of the bytes, independent of partitioning,
  * task retries, and row order. No SQL engine exposes zlib, so the
  * registered row is gated by a pinned-checksum companion (the
  * xxhash64/minhash discipline) plus property specs (repetition
  * compresses, noise does not, determinism under repartition).
  *
  * Scale design (the 100 TB contract): one `mapPartitions` projection —
  * map-side, zero shuffle (plan-asserted in the spec); one `Deflater`
  * is allocated per PARTITION and `reset()` per row (native zlib
  * streams are expensive to construct), and only the LENGTH is kept —
  * compressed bytes never enter the row, so nothing widens the
  * downstream plan. */
object CompressStats {

  /** Per-doc (doc_id, raw_len, deflate_len, compress_ratio): raw UTF-8
    * byte length, deflate byte length, and their ratio (one IEEE
    * division, bit-stable). Empty docs get deflate_len 0 and ratio 0 —
    * a header-only stream length would be pure noise. */
  def deflateStats(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](enc)
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.BEST_COMPRESSION)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val rawLen = bytes.length.toLong
          val defLen =
            if (rawLen == 0L) 0L
            else {
              deflater.reset()
              deflater.setInput(bytes)
              deflater.finish()
              var n = 0L
              while (!deflater.finished()) n += deflater.deflate(buf)
              n
            }
          val ratio =
            if (rawLen == 0L) 0.0 else defLen.toDouble / rawLen.toDouble
          (id, rawLen, defLen, ratio)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaDouble))
      .toDF(idCol, "raw_len", "deflate_len", "compress_ratio")
  }
}
