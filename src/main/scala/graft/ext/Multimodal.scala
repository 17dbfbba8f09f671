package graft.ext

import java.awt.geom.AffineTransform
import java.awt.image.{AffineTransformOp, BufferedImage}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row shape for [[Multimodal.audioMeta]] (top-level so the case-class
  * encoder stays on the codegen path — a nested class's outer pointer
  * defeats it). */
private[ext] case class AudioMetaRow(id: Long, format: String, channels: Int,
                                     sample_rate: Long, n_frames: Long,
                                     duration_ms: Long)

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators (SURVEY.md §2.8 north star).
  *
  * Image decode, pixel feature extraction, and resize are REAL: the JDK
  * ships `javax.imageio` codecs (PNG/JPEG/BMP/GIF) and `java.awt.image`
  * raster ops, so blobs here are genuine encoded image bytes produced by
  * `ImageIO.write` and consumed by `ImageIO.read` /
  * `AffineTransformOp`. Audio decode is likewise real via
  * `javax.sound.sampled` (WAV). Only VIDEO has no JDK codec, so frame
  * sampling remains a disclosed byte-slicing stand-in ([[sampleFrames]]).
  *
  * The Spark-side shape is what matters at 100 TB and is identical for
  * stub or real codecs: per-partition batched processing
  * (`mapPartitions`, codec state initialised once per partition), typed
  * metadata out, and the rule that binary payloads are never shuffled —
  * metadata/features are extracted map-side and the blob column is
  * pruned before any wide operator.
  */
object Multimodal {

  // Executor-side codec hygiene, once per JVM: ImageIO's default disk
  // cache would spill every in-memory byte[] blob to a scratch file;
  // headless guards against an accidental X11 pipeline dependency.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  /** Typed metadata carried alongside every media blob. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // e.g. png, bmp, wave
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType),
  ))

  /** Byte length of a blob — derivable without a codec; pure Catalyst,
    * stays in codegen. */
  def nBytes(blob: Column): Column = length(blob).cast("long")

  // ------------------------------------------------------------------
  // Deterministic fixtures (the SQL-restatable contract with the oracle)
  // ------------------------------------------------------------------

  /** Pixel value at (x, y) of the synthesized image for `id`, in
    * [0, 2^24). The formula is the contract with the DuckDB oracle:
    * `(id*1000003 + y*1009 + x) % 16777216`; r = v>>16, g = (v>>8)&255,
    * b = v&255. */
  def pixelValue(id: Long, x: Int, y: Int): Int =
    (((id * 1000003L + y.toLong * 1009L + x.toLong) % 16777216L) + 16777216L).toInt % 16777216

  /** Fixture dimensions/format, SQL-restatable over `doc_id`. */
  def fixtureWidth(id: Long): Int = 8 + math.floorMod(id, 17L).toInt
  def fixtureHeight(id: Long): Int = 8 + math.floorMod(id, 13L).toInt
  def fixtureFormat(id: Long): String = if (id % 2 == 0) "png" else "bmp"

  /** Encode one synthesized image to real `format` bytes via ImageIO. */
  def synthesizeImage(id: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, 0xff000000 | pixelValue(id, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** (id) → (id, blob): real PNG (even ids) / BMP (odd ids) bytes with
    * the fixture dimensions. Runs map-side; one codec context per
    * partition — the shape a real ingester shares. */
  def synthesizeImages(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          (id, synthesizeImage(id, fixtureWidth(id), fixtureHeight(id), fixtureFormat(id)))
        }
      }(enc)
      .toDF(idCol, "blob")
  }

  // ------------------------------------------------------------------
  // Real image decode
  // ------------------------------------------------------------------

  /** Header-only probe: format name + dimensions WITHOUT decoding the
    * raster — `ImageReader.getWidth(0)` reads only the header, the O(1)
    * metadata path you want when scanning 100 TB of blobs.
    * Unrecognisable OR corrupt bytes (e.g. a valid PNG magic with a
    * truncated header, which throws from the reader) degrade to
    * ("", 0, 0) — one bad blob must not fail the stage. */
  def readImageHeader(bytes: Array[Byte]): (String, Int, Int) = {
    if (bytes == null || bytes.length == 0) return ("", 0, 0)
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) ("", 0, 0)
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            (r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => ("", 0, 0) }
  }

  /** Full-raster decode with the same degrade contract as
    * [[readImageHeader]]: null for empty, unrecognisable, or corrupt
    * bytes (ImageIO.read both returns null AND throws depending on the
    * failure mode — callers get one rule). */
  private def readImageOrNull(bytes: Array[Byte]): BufferedImage =
    if (bytes == null || bytes.length == 0) null
    else
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }

  /** Attach real decoded metadata to (id, blob) rows: format, width,
    * height (header-only ImageIO probe — no raster decode), n_bytes.
    * `mapPartitions` so codec init amortizes per partition; the blob
    * never leaves the map side. Unrecognisable bytes → ("", 0, 0). */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
                 blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (fmt, w, h) = readImageHeader(bytes)
          (id, fmt, w, h, if (bytes == null) 0L else bytes.length.toLong)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaLong))
      .toDF(idCol, "format", "width", "height", "n_bytes")
  }

  /** Full-raster decode → exact per-channel pixel sums (id, n_pixels,
    * sum_r, sum_g, sum_b). Long sums, not doubles, so the DuckDB oracle
    * can recompute them EXACTLY from [[pixelValue]] — a hash-gated proof
    * that the real codec round-trips pixel-perfect. Map-side only. */
  def imageChannelSums(spark: SparkSession, df: DataFrame, idCol: String,
                       blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readImageOrNull(bytes)
          if (img == null) (id, 0L, 0L, 0L, 0L)
          else {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            (id, img.getWidth.toLong * img.getHeight, sr, sg, sb)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "n_pixels", "sum_r", "sum_g", "sum_b")
  }

  /** Order-independent 64-bit checksum of the decoded raster (RGB only,
    * position-mixed) — for pinning resize output, whose bilinear pixels
    * are deterministic but not SQL-restatable. */
  def pixelChecksum(img: BufferedImage): Long = {
    var h = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        var v = (img.getRGB(x, y) & 0xffffffL) + x.toLong * 2654435761L + y.toLong * 40503L
        // splitmix64 finalizer — position-sensitive but XOR-foldable
        v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
        v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
        h ^= v ^ (v >>> 31)
        x += 1
      }
      y += 1
    }
    h
  }

  // ------------------------------------------------------------------
  // Real resize
  // ------------------------------------------------------------------

  /** Real bilinear resize: decode → `AffineTransformOp(TYPE_BILINEAR)`
    * into a target-size RGB raster → re-encode as `outFormat`. Output
    * (id, blob_resized). Pure-Java2D software path (headless-safe),
    * deterministic for a given JDK. Undecodable input → empty blob. */
  def resizeImages(spark: SparkSession, df: DataFrame, idCol: String,
                   blobCol: String, targetW: Int, targetH: Int,
                   outFormat: String = "png"): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val src = readImageOrNull(bytes)
          if (src == null) (id, Array.empty[Byte])
          else {
            // AffineTransformOp interpolates poorly from sub-byte /
            // indexed rasters; normalize the source to INT_RGB first
            val rgb =
              if (src.getType == BufferedImage.TYPE_INT_RGB) src
              else {
                val c = new BufferedImage(src.getWidth, src.getHeight,
                  BufferedImage.TYPE_INT_RGB)
                val g = c.createGraphics()
                try g.drawImage(src, 0, 0, null) finally g.dispose()
                c
              }
            val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
            val tx = AffineTransform.getScaleInstance(
              targetW.toDouble / rgb.getWidth, targetH.toDouble / rgb.getHeight)
            new AffineTransformOp(tx, AffineTransformOp.TYPE_BILINEAR).filter(rgb, dst)
            val out = new ByteArrayOutputStream()
            require(ImageIO.write(dst, outFormat, out), s"no ImageIO writer for $outFormat")
            (id, out.toByteArray)
          }
        }
      }(enc)
      .toDF(idCol, "blob_resized")
  }

  /** Decode → [[pixelChecksum]] per blob: (id, checksum, width, height).
    * The per-image pin primitive for gate rows. */
  def imageChecksums(spark: SparkSession, df: DataFrame, idCol: String,
                     blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readImageOrNull(bytes)
          if (img == null) (id, 0L, 0, 0)
          else (id, pixelChecksum(img), img.getWidth, img.getHeight)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaInt, Encoders.scalaInt))
      .toDF(idCol, "checksum", "width", "height")
  }

  // ------------------------------------------------------------------
  // Real audio (WAV via javax.sound.sampled)
  // ------------------------------------------------------------------

  /** Synthesize a real 16-bit mono PCM WAV with `nFrames` frames at
    * `sampleRate` Hz; samples from a deterministic mix of (id, frame). */
  def synthesizeWav(id: Long, nFrames: Int, sampleRate: Float = 8000f): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = ((id * 31L + i.toLong * 7L) % 65536L - 32768L).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out) finally ais.close()
    out.toByteArray
  }

  /** (id) → (id, blob) real WAV bytes; frame count `800 + (id%100)*8`
    * at 8 kHz ⇒ duration_ms = `100 + id%100` exactly (the
    * SQL-restatable contract). */
  def synthesizeWavs(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          (id, synthesizeWav(id, 800 + math.floorMod(id, 100L).toInt * 8))
        }
      }(enc)
      .toDF(idCol, "blob")
  }

  /** Real audio metadata via `AudioSystem.getAudioFileFormat` — header
    * parse only, no sample decode. Output (id, format, channels,
    * sample_rate, n_frames, duration_ms). Unparseable → ("", 0, …). */
  def audioMeta(spark: SparkSession, df: DataFrame, idCol: String,
                blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
            val f = aff.getFormat
            val frames = aff.getFrameLength.toLong
            val rate = f.getSampleRate
            val durMs = if (rate > 0) (frames * 1000L) / rate.toLong else 0L
            AudioMetaRow(id, aff.getType.toString.toLowerCase, f.getChannels,
              rate.toLong, frames, durMs)
          } catch {
            case _: Exception => AudioMetaRow(id, "", 0, 0L, 0L, 0L)
          }
        }
      }(Encoders.product[AudioMetaRow])
      .toDF(idCol, "format", "channels", "sample_rate", "n_frames", "duration_ms")
  }

  // ------------------------------------------------------------------
  // Video (no JDK codec — disclosed byte-slicing stand-in)
  // ------------------------------------------------------------------

  /** Frame sampling for video-like payloads: slice `n` evenly-spaced
    * fixed-width windows out of the blob. The JDK has no video codec, so
    * this is a DISCLOSED STUB: a real impl samples decoded frames; the
    * slicing/explode shape is identical. One row per
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

  /** Deterministic pseudo-embedding from blob bytes (content-hash folded
    * into `dim` floats) — the feature-extraction stand-in for modalities
    * WITHOUT a JDK codec (video). For images use the real
    * [[imageChannelSums]]. Map-side, fixed-width array out, blob
    * prunable after. */
  def fakeFeatures(blob: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(i, blob), lit(2000001L)).cast("double") / 1000000.0) - 1.0)
}
