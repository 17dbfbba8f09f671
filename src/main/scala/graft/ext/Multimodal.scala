package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators (SURVEY.md §2.8 north star).
  *
  * The media codecs themselves are NOT available in this environment, so
  * the decode kernels are DETERMINISTIC STUBS (clearly marked below) —
  * what is real, and tested, is the Spark-side shape that matters at
  * 100 TB: schema, per-partition batched processing, and the rule that
  * binary payloads are never shuffled (metadata/features are extracted
  * map-side and the blob column is pruned before any wide operator).
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // e.g. jpeg, wav, mp4
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType),
  ))

  /** Byte length of a blob — the one metadata field derivable without a
    * codec; pure Catalyst, stays in codegen. */
  def nBytes(blob: Column): Column = length(blob).cast("long")

  /** STUB decode: parses a fake fixed header instead of a real codec.
    * Header layout (written by tests / upstream ingesters):
    * bytes 0-3 width (big-endian int), 4-7 height. A real deployment
    * swaps `decodeHeader` for an image library call inside the same
    * `mapPartitions` shape — partition-batched, one codec instance per
    * partition, metadata out, blob untouched. */
  def decodeHeader(bytes: Array[Byte]): (Int, Int) =
    if (bytes == null || bytes.length < 8) (0, 0)
    else {
      def be(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      (be(0), be(4))
    }

  /** Attach decoded metadata to (id, blob) rows. `mapPartitions` so a real
    * codec would amortize init per partition (the Pandas-UDF batching
    * shape, expressed Scala-native). Output: (id, width, height, n_bytes). */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
                 blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        // real codec init would happen once here, per partition
        it.map { case (id, bytes) =>
          val (w, h) = decodeHeader(bytes)
          (id, w, h, if (bytes == null) 0L else bytes.length.toLong)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        Encoders.scalaInt, Encoders.scalaLong))
      .toDF(idCol, "width", "height", "n_bytes")
    out
  }

  /** STUB resize: rewrites the fixed header to the target dimensions and
    * subsamples the payload to at most targetW*targetH evenly spaced
    * bytes (a real implementation swaps in a codec's scaler — the
    * partition-batched shape, header contract, and size bound are the
    * Spark-side parts that matter). Output blob layout: 8-byte header
    * (targetW, targetH big-endian) + subsampled payload. */
  def resizeStub(spark: SparkSession, df: DataFrame, idCol: String,
                 blobCol: String, targetW: Int, targetH: Int): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        // real codec/scaler init would happen once here, per partition
        val cap = targetW * targetH
        it.map { case (id, bytes) =>
          val payload = if (bytes == null || bytes.length <= 8)
            Array.empty[Byte] else bytes.drop(8)
          val n = math.min(payload.length, cap)
          val out = new Array[Byte](8 + n)
          val bb = java.nio.ByteBuffer.wrap(out)
          bb.putInt(targetW).putInt(targetH)
          var i = 0
          while (i < n) {
            // evenly spaced subsample (first byte anchored)
            val src = if (n <= 1) 0
              else (i.toLong * (payload.length - 1) / (n - 1)).toInt
            out(8 + i) = payload(src)
            i += 1
          }
          (id, out)
        }
      }(enc)
      .toDF(idCol, "blob_resized")
  }

  /** STUB feature extraction: deterministic pseudo-embedding from the blob
    * bytes (content-hash folded into `dim` floats). Real systems replace
    * the kernel; the Spark contract — map-side, fixed-width array out,
    * blob prunable after — is the tested part. */
  def fakeFeatures(blob: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(i, blob), lit(2000001L)).cast("double") / 1000000.0) - 1.0)

  /** Frame sampling for video-like payloads: slice `n` evenly-spaced
    * fixed-width windows out of the blob (a real impl samples decoded
    * frames; the slicing/explode shape is identical). Output one row per
    * (id, frame_idx, frame_bytes). */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   n: Int, frameBytes: Int): DataFrame = {
    val withIdx = df.select(col(idCol), col(blobCol),
      posexplode(sequence(lit(0), lit(n - 1))))
      .withColumnRenamed("col", "frame_idx").drop("pos")
    withIdx.select(col(idCol), col("frame_idx"),
      expr(s"substring($blobCol, cast(frame_idx * greatest(length($blobCol) - $frameBytes, 1) / ${math.max(n - 1, 1)} as int) + 1, $frameBytes)")
        .as("frame_bytes"))
  }
}
