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

/** Row shape for [[Multimodal.videoMeta]] (top-level for the same
  * codegen-encoder reason as [[AudioMetaRow]]). */
private[ext] case class VideoMetaRow(id: Long, container: String, width: Int,
                                     height: Int, n_frames: Long,
                                     n_frames_demuxed: Long, duration_ms: Long)

/** Row shape for [[Multimodal.mp4Meta]] (top-level for the same
  * codegen-encoder reason as [[AudioMetaRow]]). */
private[ext] case class Mp4MetaRow(id: Long, brand: String, timescale: Long,
                                   duration_ms: Long, n_tracks: Long,
                                   width: Int, height: Int, n_samples: Long,
                                   mdat_bytes: Long)

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

  /** Full PCM decode → exact integer sample sums (id, n_samples,
    * sum_s, sum_abs). The audio sibling of [[imageChannelSums]]: long
    * sums the DuckDB oracle recomputes EXACTLY from the fixture sample
    * formula — a hash-gated proof the `javax.sound` decode round-trips
    * every 16-bit sample, not just the header. Map-side; undecodable
    * input → zeros. */
  def audioSampleSums(spark: SparkSession, df: DataFrame, idCol: String,
                      blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
              val data = ais.readAllBytes()
              var i = 0; var n = 0L; var s = 0L; var a = 0L
              while (i + 1 < data.length) {
                val v = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toLong
                n += 1; s += v; a += math.abs(v)
                i += 2
              }
              (id, n, s, a)
            } finally ais.close()
          } catch { case _: Exception => (id, 0L, 0L, 0L) }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "n_samples", "sum_s", "sum_abs")
  }

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
  // Format sniffing (mixed-blob routing)
  // ------------------------------------------------------------------

  /** Magic-byte format sniff for a mixed blob column — the routing
    * step a 100 TB media lake runs FIRST (extensions and upstream
    * content-types lie; 8 bytes of the blob do not): png / bmp / wav /
    * avi (RIFF subtype) / mp4 (ISO-BMFF ftyp) / empty / unknown. Pure
    * function of the first bytes — map-side, never decodes, never
    * shuffles the blob. */
  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return "empty"
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (c, i) => at(from + i) == c.toInt }
    if (at(0) == 0x89 && ascii(1, "PNG")) "png"
    else if (ascii(0, "BM")) "bmp"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else if (ascii(0, "RIFF") && ascii(8, "AVI ")) "avi"
    else if (bytes.length >= 12 && ascii(4, "ftyp")) "mp4"
    else "unknown"
  }

  /** (id, blob) → (id, format, n_bytes): the sniffed route. */
  def sniffFormats(spark: SparkSession, df: DataFrame, idCol: String,
                   blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, sniffFormat(bytes),
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaLong))
      .toDF(idCol, "format", "n_bytes")
  }

  /** Mixed-blob fixture: id mod 5 selects the container actually
    * synthesized (0 png, 1 bmp, 2 wav, 3 avi, 4 mp4) — REAL bytes from
    * the respective writers, so the sniffed route the oracle restates
    * from the id formula is a claim about real container magics. */
  def synthesizeMixedBlobs(spark: SparkSession, df: DataFrame,
                           idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val blob = (id % 5) match {
            case 0 => synthesizeImage(id, fixtureWidth(id), fixtureHeight(id), "png")
            case 1 => synthesizeImage(id, fixtureWidth(id), fixtureHeight(id), "bmp")
            case 2 => synthesizeWav(id, 64)
            case 3 => synthesizeAvi(id, 16, 12, 2)
            case _ => synthesizeMp4(id, 16, 12, 2)
          }
          (id, blob)
        }
      }(enc)
      .toDF(idCol, "blob")
  }

  // ------------------------------------------------------------------
  // Perceptual hash (image dedup)
  // ------------------------------------------------------------------

  /** 8×8 average-hash of a decoded raster — the perceptual-dedup key
    * (aHash; the simplest member of the pHash family): integer
    * luminance 299r+587g+114b summed per grid cell (cell of pixel
    * (x,y) is (y·8 DIV h)·8 + x·8 DIV w), per-cell integer-average,
    * bit set iff the cell average exceeds the integer mean of the 64
    * cell averages. EVERY step is exact integer arithmetic, so the
    * DuckDB oracle restates the whole kernel from the fixture pixel
    * formula and hash-gates it bit-for-bit (`mm_phash`) — unlike
    * DCT-based pHash, whose floats would not cross engines. Near-dup
    * images differ in a few bits; Hamming distance is the similarity. */
  def averageHash(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](64); val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val i = cy * 8 + x * 8 / w
        sums(i) += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    val avgs = Array.tabulate(64)(i => if (counts(i) == 0) 0L else sums(i) / counts(i))
    val mean = avgs.sum / 64
    var hash = 0L; var i = 0
    while (i < 64) { if (avgs(i) > mean) hash |= 1L << i; i += 1 }
    hash
  }

  /** (id, blob) → (id, phash, decoded): decode map-side, hash the
    * raster. Undecodable input → `decoded = false` (phash 0 as a
    * placeholder), never a failed stage — and never a PAIRABLE hash:
    * hashing failures to a real value would report any two corrupt
    * blobs (or a corrupt blob vs a genuinely all-dark image) as
    * Hamming-0 near-duplicates and silently drop valid documents at
    * scale, so [[phashNearDups]] excludes undecoded rows from the
    * join. */
  def imagePhash(spark: SparkSession, df: DataFrame, idCol: String,
                 blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readImageOrNull(bytes)
          if (img == null) (id, 0L, false) else (id, averageHash(img), true)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaBoolean))
      .toDF(idCol, "phash", "decoded")
  }

  /** Near-duplicate image pairs by pHash Hamming distance ≤
    * `maxHamming` (≤ 3): the 64-bit hash splits into four 16-bit
    * blocks — pigeonhole: two hashes within Hamming 3 agree on at
    * least one block — so candidates come from a block-equality
    * inverted-index join (the [[graft.ext.IncrementalSimHash]]
    * discipline; never all-pairs, blobs long gone), then the exact
    * 8-byte Hamming verify. Lossless for the given radius. */
  def phashNearDups(hashes: DataFrame, idCol: String,
                    maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-block pigeonhole is lossless only for radius <= 3, got $maxHamming")
    val blocks = (0 until 4).map(b =>
      shiftright(col("phash"), b * 16).bitwiseAND(lit(0xffffL)))
    // failed decodes carry a placeholder hash, not an image signature —
    // keep them out of the candidate join (see [[imagePhash]])
    val decodedOnly =
      if (hashes.columns.contains("decoded")) hashes.where(col("decoded"))
      else hashes
    val keyed = decodedOnly.select(col(idCol).as("id"), col("phash"))
      .select(col("id"), col("phash"),
        posexplode(array(blocks: _*)).as(Seq("blk", "bval")))
    keyed.as("a").join(keyed.as("b"),
        col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.phash").as("h_a"), col("b.phash").as("h_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** The per-cell byte of the MOSAIC fixture: each 8×8 grid cell is a
    * solid red block with a scrambled byte value — per-cell structure
    * (what real photos have and the smooth [[pixelValue]] gradient
    * lacks), so aHash bits are decided by byte-scale differences, not
    * borderline noise, and unrelated images sit ~32 bits apart. The
    * scramble is two rounds mod the prime 1e9+7 — scale-then-SQUARE —
    * because any single affine map leaks linear structure into the low
    * byte (measured: one round collapsed 500 images to 5 distinct
    * hashes via t² mod 256 = f(t mod 128)); all arithmetic stays in
    * BIGINT range so the oracle restates it exactly. */
  def mosaicCellByte(sid: Long, cx: Int, cy: Int): Int = {
    val t = Math.floorMod(sid, 100000L) * 64L + (cy * 8 + cx) + 1L
    val u = t * 2654435761L % 1000000007L
    (u * u % 1000000007L % 256L).toInt
  }

  /** Fixture with PLANTED image near-dups over the mosaic scheme: ids
    * ≡ 5 (mod 10) render the PARTNER id−5's mosaic (same dimensions)
    * with pixel (0,0)'s red byte shifted +16 — a near-copy whose pHash
    * sits 0–1 bits from the partner's, while every unrelated pair stays
    * far outside the radius. SQL-restatable end to end. */
  def synthesizeImagesWithDups(spark: SparkSession, df: DataFrame,
                               idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val dup = id % 10 == 5 && id >= 5
          val src = if (dup) id - 5 else id
          val w = fixtureWidth(src); val h = fixtureHeight(src)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cb = mosaicCellByte(src, x * 8 / w, y * 8 / h)
              val red = if (dup && x == 0 && y == 0) (cb + 16) % 256 else cb
              img.setRGB(x, y, 0xff000000 | (red << 16))
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          require(ImageIO.write(img, fixtureFormat(id), out), "no writer")
          (id, out.toByteArray)
        }
      }(enc)
      .toDF(idCol, "blob")
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
  // Video container: real AVI/RIFF byte-level writing and parsing.
  //
  // The JDK has no video CODEC, so frame PAYLOADS stay opaque bytes
  // ([[sampleFrames]]), but the CONTAINER is a public byte format
  // (Microsoft RIFF/AVI spec: 'RIFF' size 'AVI ' holding LIST chunks;
  // the 56-byte 'avih' main header carries dwMicroSecPerFrame,
  // dwTotalFrames, dwWidth, dwHeight; stream data lives in the 'movi'
  // LIST as '00db'/'00dc' chunks). Metadata extraction here is REAL
  // container parsing — chunk walking with word alignment — and the
  // demuxed-frame count cross-checks the header against the actual
  // 'movi' contents.
  // ------------------------------------------------------------------

  /** Video fixture formulas, SQL-restatable over `doc_id` (the
    * mm_video_meta oracle contract). 25 fps ⇒ duration_ms = 40/frame. */
  def fixtureVideoWidth(id: Long): Int = 16 + math.floorMod(id, 9L).toInt * 2
  def fixtureVideoHeight(id: Long): Int = 12 + math.floorMod(id, 7L).toInt * 2
  def fixtureVideoFrames(id: Long): Int = 4 + math.floorMod(id, 6L).toInt
  val VideoUsecPerFrame: Int = 40000
  val VideoFrameBytes: Int = 16

  private def fourccBytes(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: $s")
    s.getBytes("US-ASCII")
  }

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** A RIFF chunk: fourcc + little-endian size + body + pad byte to the
    * spec's 16-bit alignment. */
  private def riffChunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(8 + body.length + 1)
    out.write(fourccBytes(fourcc)); out.write(u32le(body.length.toLong))
    out.write(body)
    if (body.length % 2 == 1) out.write(0)
    out.toByteArray
  }

  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(fourccBytes(listType))
    children.foreach(body.write)
    riffChunk("LIST", body.toByteArray)
  }

  /** Deterministic frame payload bytes for (id, frameIdx). */
  def videoFramePayload(id: Long, frameIdx: Int): Array[Byte] =
    Array.tabulate(VideoFrameBytes)(j =>
      math.floorMod(id * 31L + frameIdx.toLong * 7L + j.toLong * 13L, 256L).toByte)

  /** Write one spec-valid AVI: hdrl (avih main header + one 'vids'
    * strl) + movi with `nFrames` '00db' chunks of deterministic
    * payload. Every field below is from the public AVI/BITMAPINFOHEADER
    * layout; no codec involved — the raster bytes are opaque payload. */
  def synthesizeAvi(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val avih = new ByteArrayOutputStream(56)
    avih.write(u32le(VideoUsecPerFrame.toLong)) // dwMicroSecPerFrame
    avih.write(u32le(0)); avih.write(u32le(0)); avih.write(u32le(0))
    avih.write(u32le(nFrames.toLong))           // dwTotalFrames
    avih.write(u32le(0))
    avih.write(u32le(1))                        // dwStreams
    avih.write(u32le(0))
    avih.write(u32le(w.toLong))                 // dwWidth
    avih.write(u32le(h.toLong))                 // dwHeight
    (0 until 4).foreach(_ => avih.write(u32le(0))) // dwReserved[4]
    val strh = new ByteArrayOutputStream(56)
    strh.write(fourccBytes("vids")); strh.write(fourccBytes("DIB "))
    strh.write(u32le(0))                        // dwFlags
    strh.write(u16le(0)); strh.write(u16le(0))  // wPriority, wLanguage
    strh.write(u32le(0))                        // dwInitialFrames
    strh.write(u32le(1))                        // dwScale
    strh.write(u32le(25))                       // dwRate (25 fps)
    strh.write(u32le(0))                        // dwStart
    strh.write(u32le(nFrames.toLong))           // dwLength
    strh.write(u32le(0))                        // dwSuggestedBufferSize
    strh.write(u32le(0))                        // dwQuality
    strh.write(u32le(0))                        // dwSampleSize
    (0 until 4).foreach(_ => strh.write(u16le(0))) // rcFrame
    val strf = new ByteArrayOutputStream(40)    // BITMAPINFOHEADER
    strf.write(u32le(40)); strf.write(u32le(w.toLong)); strf.write(u32le(h.toLong))
    strf.write(u16le(1)); strf.write(u16le(24)) // biPlanes, biBitCount
    strf.write(u32le(0))                        // biCompression = BI_RGB
    strf.write(u32le(w.toLong * h * 3))         // biSizeImage
    (0 until 4).foreach(_ => strf.write(u32le(0)))
    val hdrl = riffList("hdrl", riffChunk("avih", avih.toByteArray),
      riffList("strl", riffChunk("strh", strh.toByteArray),
        riffChunk("strf", strf.toByteArray)))
    val movi = riffList("movi",
      (0 until nFrames).map(f => riffChunk("00db", videoFramePayload(id, f))): _*)
    val body = new ByteArrayOutputStream()
    body.write(fourccBytes("AVI "))
    body.write(hdrl); body.write(movi)
    riffChunk("RIFF", body.toByteArray)
  }

  /** (id) → (id, blob): real AVI container bytes with the fixture
    * dimensions/frame counts. Map-side, like the image/WAV writers. */
  def synthesizeAvis(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          (id, synthesizeAvi(id, fixtureVideoWidth(id), fixtureVideoHeight(id),
            fixtureVideoFrames(id)))
        }
      }(enc)
      .toDF(idCol, "blob")
  }

  /** Parse AVI container metadata by walking the RIFF chunk tree:
    * (container, width, height, nFramesHeader, nFramesDemuxed,
    * durationMs). `nFramesDemuxed` counts the actual '..db'/'..dc'
    * stream-data chunks inside 'movi' — the header-vs-content
    * cross-check. Degrades to ("", 0, …) on anything that is not a
    * well-formed RIFF-AVI (same one-bad-blob rule as the image/audio
    * parsers). */
  def parseAviMeta(bytes: Array[Byte]): (String, Int, Int, Long, Long, Long) = {
    val Bad = ("", 0, 0, 0L, 0L, 0L)
    if (bytes == null || bytes.length < 12) return Bad
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def cc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    try {
      if (cc(0) != "RIFF" || cc(8) != "AVI ") return Bad
      var usec = 0L; var totalFrames = 0L; var w = 0; var h = 0
      var demuxed = 0L; var sawAvih = false
      // walk [from, until) as a sequence of chunks; returns unit,
      // accumulating into the vars above
      def walk(from: Int, until: Int, in: String): Unit = {
        var off = from
        while (off + 8 <= until) {
          val id = cc(off)
          val size = u32(off + 4)
          val body = off + 8
          // Long compare BEFORE narrowing: a corrupt 32-bit size can
          // wrap Int and fake a plausible end offset
          if (size > (until - body).toLong) return
          val end = body + size.toInt
          if (id == "LIST" && size >= 4) {
            val ltype = cc(body)
            if (ltype == "hdrl" || ltype == "strl" || ltype == "movi")
              walk(body + 4, end, ltype)
          } else if (id == "avih" && size >= 40) {
            sawAvih = true
            usec = u32(body); totalFrames = u32(body + 16)
            w = u32(body + 32).toInt; h = u32(body + 36).toInt
          } else if (in == "movi" && id.length == 4 &&
            (id.endsWith("db") || id.endsWith("dc"))) {
            demuxed += 1
          }
          off = end + (size % 2).toInt // word alignment
        }
      }
      walk(12, bytes.length, "riff")
      if (!sawAvih) Bad
      else ("avi", w, h, totalFrames, demuxed, totalFrames * usec / 1000L)
    } catch { case _: Exception => Bad }
  }

  /** Demux the movi stream-data chunk payloads ('..db'/'..dc') of one
    * AVI, in container order. Same chunk walk as [[parseAviMeta]];
    * garbage degrades to an empty list. */
  def demuxAviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return Nil
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    try {
      if (cc(0) != "RIFF" || cc(8) != "AVI ") return Nil
      def walk(from: Int, until: Int, in: String): Unit = {
        var off = from
        while (off + 8 <= until) {
          val id = cc(off)
          val size = u32(off + 4)
          val body = off + 8
          if (size > (until - body).toLong) return
          val end = body + size.toInt
          if (id == "LIST" && size >= 4) {
            val ltype = cc(body)
            if (ltype == "hdrl" || ltype == "strl" || ltype == "movi")
              walk(body + 4, end, ltype)
          } else if (in == "movi" && id.length == 4 &&
            (id.endsWith("db") || id.endsWith("dc"))) {
            out += java.util.Arrays.copyOfRange(bytes, body, end)
          }
          off = end + (size % 2).toInt
        }
      }
      walk(12, bytes.length, "riff")
      out.toSeq
    } catch { case _: Exception => Nil }
  }

  /** Real frame DEMUX over (id, blob) AVI rows: one row per movi chunk,
    * (id, frame_idx, frame_bytes), in container order — the genuine
    * replacement for [[sampleFrames]]' byte-slicing when the payload
    * lives in a real container. Map-side flatMap; payloads stay opaque
    * (no codec), but their position and bytes are container-exact. */
  def aviFrames(spark: SparkSession, df: DataFrame, idCol: String,
                blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          demuxAviFrames(bytes).iterator.zipWithIndex.map {
            case (payload, i) => (id, i, payload)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY))
      .toDF(idCol, "frame_idx", "frame_bytes")
  }

  /** Per-demuxed-frame stats (id, frame_idx, frame_len, frame_sum):
    * the SQL-restatable projection of [[aviFrames]] (byte sums are
    * computable from the fixture payload formula), derived map-side so
    * the binary payload never reaches a wide operator. */
  def aviFrameStats(spark: SparkSession, df: DataFrame, idCol: String,
                    blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          demuxAviFrames(bytes).iterator.zipWithIndex.map {
            case (p, i) =>
              var s = 0L
              var j = 0
              while (j < p.length) { s += (p(j) & 0xff); j += 1 }
              (id, i.toLong, p.length.toLong, s)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "frame_idx", "frame_len", "frame_sum")
  }

  /** Real container-metadata extraction over (id, blob) AVI rows —
    * `mapPartitions` chunk-walk, blob never leaves the map side. */
  def videoMeta(spark: SparkSession, df: DataFrame, idCol: String,
                blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (c, w, h, nf, nd, dur) = parseAviMeta(bytes)
          VideoMetaRow(id, c, w, h, nf, nd, dur)
        }
      }(Encoders.product[VideoMetaRow])
      .toDF(idCol, "container", "width", "height", "n_frames",
        "n_frames_demuxed", "duration_ms")
  }

  // ------------------------------------------------------------------
  // Video frames (no JDK codec — disclosed byte-slicing stand-in)
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

  // ------------------------------------------------------------------
  // MP4 / ISO-BMFF container: real box-level writing and parsing.
  //
  // Second real container beside AVI, from the public ISO/IEC 14496-12
  // layout: big-endian length-prefixed boxes (size u32 + fourcc;
  // size==1 ⇒ 64-bit largesize follows, size==0 ⇒ to EOF), `moov`
  // carrying the movie header (`mvhd`: timescale + duration), one
  // `trak` per stream (`tkhd`: 16.16 fixed-point width/height;
  // `mdia`→`minf`→`stbl` with the sample table, whose `stsz` holds the
  // sample count/sizes), and media payload in `mdat`. No codec is
  // involved — sample payloads stay opaque bytes; parsing is a real
  // box walk with container descent, and the `stsz` sample count
  // cross-checks against the actual `mdat` payload length.
  // ------------------------------------------------------------------

  /** MP4 fixture timescale: 1000 units/s, so mvhd durations read in
    * milliseconds directly (25 fps ⇒ 40 units/frame). */
  val Mp4Timescale: Int = 1000
  val Mp4FrameDelta: Int = VideoUsecPerFrame / 1000 // 40 ms at 25 fps

  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u16be(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One ISO-BMFF box: u32 BE size (header included) + fourcc + body. */
  private def mp4Box(tpe: String, bodies: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(u32be(8L + bodies.map(_.length.toLong).sum))
    out.write(fourccBytes(tpe))
    bodies.foreach(out.write)
    out.toByteArray
  }

  /** FullBox = box whose body starts with version u8 + flags u24. */
  private def mp4FullBox(tpe: String, version: Int, flags: Int,
                         bodies: Array[Byte]*): Array[Byte] =
    mp4Box(tpe, (Array(version.toByte) ++
      Array(((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
        (flags & 0xff).toByte)) +: bodies: _*)

  /** The identity transformation matrix every movie/track header
    * carries (three 16.16 rows ending in the 2.30 w-component). */
  private def mp4UnityMatrix: Array[Byte] = {
    val out = new ByteArrayOutputStream(36)
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(v => out.write(u32be(v)))
    out.toByteArray
  }

  /** Write one spec-valid MP4 (ISO base media file): `ftyp` + `moov`
    * (mvhd, one video trak with a full stbl: stsd/stts/stsc/stsz/stco)
    * + `mdat` holding `nFrames` deterministic
    * [[videoFramePayload]] samples. Every offset/field follows the
    * public 14496-12 layout; the `stco` chunk offset is the real file
    * offset of the mdat payload (moov is built twice — its size does
    * not depend on the offset value, so the second build is exact). */
  def synthesizeMp4(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val dur = nFrames.toLong * Mp4FrameDelta
    val ftyp = mp4Box("ftyp", fourccBytes("isom"), u32be(0x200L),
      fourccBytes("isom"), fourccBytes("iso2"))
    def moov(mdatPayloadOffset: Long): Array[Byte] = {
      val mvhd = mp4FullBox("mvhd", 0, 0,
        u32be(0), u32be(0),                    // creation, modification
        u32be(Mp4Timescale.toLong), u32be(dur),
        u32be(0x00010000L), u16be(0x0100),     // rate 1.0, volume 1.0
        u16be(0), u32be(0), u32be(0),          // reserved
        mp4UnityMatrix,
        Array.fill(24)(0.toByte),              // pre_defined[6]
        u32be(2L))                             // next_track_ID
      val tkhd = mp4FullBox("tkhd", 0, 0x7,    // enabled|in_movie|in_preview
        u32be(0), u32be(0), u32be(1L),         // track_ID = 1
        u32be(0), u32be(dur),
        u32be(0), u32be(0),                    // reserved u64
        u16be(0), u16be(0), u16be(0), u16be(0),// layer, group, volume, rsvd
        mp4UnityMatrix,
        u32be(w.toLong << 16), u32be(h.toLong << 16)) // 16.16 fixed
      val mdhd = mp4FullBox("mdhd", 0, 0,
        u32be(0), u32be(0), u32be(Mp4Timescale.toLong), u32be(dur),
        u16be(0x55C4), u16be(0))               // language 'und'
      val hdlr = mp4FullBox("hdlr", 0, 0,
        u32be(0), fourccBytes("vide"),
        u32be(0), u32be(0), u32be(0),
        Array[Byte]('g', 'r', 'a', 'f', 't', 0))
      val vmhd = mp4FullBox("vmhd", 0, 1, u16be(0), u16be(0), u16be(0), u16be(0))
      val dinf = mp4Box("dinf",
        mp4FullBox("dref", 0, 0, u32be(1L),
          mp4FullBox("url ", 0, 1)))           // flag 1 = self-contained
      // VisualSampleEntry 'raw ' (uncompressed payload sample entry)
      val sampleEntry = mp4Box("raw ",
        Array.fill(6)(0.toByte), u16be(1),     // reserved, data_ref_index
        u16be(0), u16be(0),                    // pre_defined, reserved
        Array.fill(12)(0.toByte),              // pre_defined[3]
        u16be(w), u16be(h),
        u32be(0x00480000L), u32be(0x00480000L),// 72 dpi
        u32be(0), u16be(1),                    // reserved, frame_count
        Array.fill(32)(0.toByte),              // compressorname
        u16be(24), u16be(0xFFFF))              // depth, pre_defined = -1
      val stsd = mp4FullBox("stsd", 0, 0, u32be(1L), sampleEntry)
      val stts = mp4FullBox("stts", 0, 0, u32be(1L),
        u32be(nFrames.toLong), u32be(Mp4FrameDelta.toLong))
      val stsc = mp4FullBox("stsc", 0, 0, u32be(1L),
        u32be(1L), u32be(nFrames.toLong), u32be(1L))
      val stsz = mp4FullBox("stsz", 0, 0,
        u32be(VideoFrameBytes.toLong),         // fixed sample size
        u32be(nFrames.toLong))
      val stco = mp4FullBox("stco", 0, 0, u32be(1L), u32be(mdatPayloadOffset))
      val stbl = mp4Box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = mp4Box("minf", vmhd, dinf, stbl)
      val mdia = mp4Box("mdia", mdhd, hdlr, minf)
      val trak = mp4Box("trak", tkhd, mdia)
      mp4Box("moov", mvhd, trak)
    }
    val moovLen = moov(0L).length
    val payload = new ByteArrayOutputStream(nFrames * VideoFrameBytes)
    (0 until nFrames).foreach(f => payload.write(videoFramePayload(id, f)))
    val mdat = mp4Box("mdat", payload.toByteArray)
    val out = new ByteArrayOutputStream()
    out.write(ftyp)
    out.write(moov(ftyp.length.toLong + moovLen + 8L)) // mdat body offset
    out.write(mdat)
    out.toByteArray
  }

  /** (id) → (id, blob): real MP4 bytes with the shared video fixture
    * dimensions/frame counts. Map-side, like [[synthesizeAvis]]. */
  def synthesizeMp4s(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"))
      .as[Long](Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          (id, synthesizeMp4(id, fixtureVideoWidth(id), fixtureVideoHeight(id),
            fixtureVideoFrames(id)))
        }
      }(enc)
      .toDF(idCol, "blob")
  }

  /** Parse MP4 metadata by walking the box tree: (brand, timescale,
    * durationMs, nTracks, width, height, nSamples, mdatBytes).
    * `nSamples` reads `stsz` (sample_count, for both fixed- and
    * varying-size tables); `mdatBytes` is the actual `mdat` payload
    * length — the header-vs-content cross-check (nSamples ×
    * fixed-size must equal it on the fixture). Handles the 64-bit
    * `largesize` and to-EOF size forms; degrades to ("", 0, …) on
    * anything that is not ISO-BMFF (the one-bad-blob rule). */
  def parseMp4Meta(bytes: Array[Byte]): (String, Long, Long, Long, Int, Int, Long, Long) = {
    val Bad = ("", 0L, 0L, 0L, 0, 0, 0L, 0L)
    if (bytes == null || bytes.length < 8) return Bad
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long =
      (u32(off) << 32) | u32(off + 4)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    var brand = ""; var timescale = 0L; var duration = 0L
    var tracks = 0L; var w = 0; var h = 0
    var samples = 0L; var mdat = 0L; var sawMoov = false
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    try {
      def walk(from: Int, until: Int): Unit = {
        var off = from
        while (off + 8 <= until) {
          val size0 = u32(off)
          val tpe = cc(off + 4)
          // size forms: 1 ⇒ u64 largesize follows the fourcc; 0 ⇒ box
          // extends to the end of the enclosing scope
          val (body, end) =
            if (size0 == 1L) {
              if (off + 16 > until) return
              val ls = u64(off + 8)
              if (ls < 16L || ls > (until - off).toLong) return
              (off + 16, off + ls.toInt)
            } else if (size0 == 0L) (off + 8, until)
            else {
              if (size0 < 8L || size0 > (until - off).toLong) return
              (off + 8, off + size0.toInt)
            }
          tpe match {
            case "ftyp" if end - body >= 4 => brand = cc(body)
            case "moov" => sawMoov = true; walk(body, end)
            case "trak" => tracks += 1; walk(body, end)
            case t if containers(t) => walk(body, end)
            case "mvhd" if end - body >= 20 && bytes(body) == 0 =>
              timescale = u32(body + 12); duration = u32(body + 16)
            case "mvhd" if end - body >= 32 => // version 1: 64-bit times
              timescale = u32(body + 20); duration = u64(body + 24)
            case "tkhd" if end - body >= 84 && bytes(body) == 0 =>
              w = (u32(body + 76) >> 16).toInt; h = (u32(body + 80) >> 16).toInt
            case "stsz" if end - body >= 12 =>
              samples += u32(body + 8) // sample_count (fixed or varying)
            case "mdat" => mdat += (end - body).toLong
            case _ => ()
          }
          off = end
        }
      }
      walk(0, bytes.length)
      if (!sawMoov) Bad
      else {
        val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
        (brand, timescale, durMs, tracks, w, h, samples, mdat)
      }
    } catch { case _: Exception => Bad }
  }

  /** Demux the sample payloads of one MP4 by the sample-table boxes —
    * the ISO-BMFF twin of [[demuxAviFrames]]: `stsz` gives per-sample
    * sizes (fixed or varying), `stsc` maps chunks to samples-per-chunk
    * runs, `stco` gives chunk file offsets; samples are sliced straight
    * out of the file bytes at offset+cumulative-size, in sample order.
    * No codec — payload bytes are returned as stored. Degrades to an
    * empty list on anything inconsistent (offsets past EOF, size
    * overflow), same one-bad-blob rule as the AVI demuxer. */
  def demuxMp4Samples(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 8) return Nil
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    var sizes: IndexedSeq[Long] = IndexedSeq.empty
    var chunkOffsets: IndexedSeq[Long] = IndexedSeq.empty
    var stscRuns: IndexedSeq[(Long, Long)] = IndexedSeq.empty // (first_chunk, per_chunk)
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    try {
      def walk(from: Int, until: Int): Unit = {
        var off = from
        while (off + 8 <= until) {
          val size0 = u32(off)
          val tpe = cc(off + 4)
          val (body, end) =
            if (size0 == 1L) {
              if (off + 16 > until) return
              val ls = u64(off + 8)
              if (ls < 16L || ls > (until - off).toLong) return
              (off + 16, off + ls.toInt)
            } else if (size0 == 0L) (off + 8, until)
            else {
              if (size0 < 8L || size0 > (until - off).toLong) return
              (off + 8, off + size0.toInt)
            }
          tpe match {
            case t if containers(t) => walk(body, end)
            case "stsz" if end - body >= 12 =>
              val fixed = u32(body + 4)
              val n = u32(body + 8)
              sizes =
                if (fixed > 0) Vector.fill(n.toInt)(fixed)
                else (0 until n.toInt).map(i => u32(body + 12 + i * 4))
            case "stsc" if end - body >= 8 =>
              val n = u32(body + 4).toInt
              stscRuns = (0 until n).map { i =>
                (u32(body + 8 + i * 12), u32(body + 12 + i * 12))
              }
            case "stco" if end - body >= 8 =>
              val n = u32(body + 4).toInt
              chunkOffsets = (0 until n).map(i => u32(body + 8 + i * 4))
            case _ => ()
          }
          off = end
        }
      }
      walk(0, bytes.length)
      if (sizes.isEmpty || chunkOffsets.isEmpty || stscRuns.isEmpty) return Nil
      // samples-per-chunk for 1-based chunk c = the last stsc run whose
      // first_chunk <= c (runs are ascending by first_chunk per spec)
      def perChunk(c: Long): Long =
        stscRuns.takeWhile(_._1 <= c).lastOption.map(_._2).getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var sample = 0
      var chunk = 1L
      while (sample < sizes.length && chunk <= chunkOffsets.length) {
        var pos = chunkOffsets(chunk.toInt - 1)
        var inChunk = 0L
        val n = perChunk(chunk)
        while (inChunk < n && sample < sizes.length) {
          val len = sizes(sample)
          if (pos < 0 || len < 0 || pos + len > bytes.length) return Nil
          out += java.util.Arrays.copyOfRange(bytes, pos.toInt, (pos + len).toInt)
          pos += len
          inChunk += 1
          sample += 1
        }
        chunk += 1
      }
      if (sample < sizes.length) Nil // chunks exhausted before samples
      else out.toSeq
    } catch { case _: Exception => Nil }
  }

  /** Per-demuxed-sample stats (id, sample_idx, sample_len, sample_sum)
    * over (id, blob) MP4 rows — the SQL-restatable projection of
    * [[demuxMp4Samples]], derived map-side (the [[aviFrameStats]]
    * pattern: byte sums restate the payload formula, so the oracle
    * hash-gates the sample-table arithmetic and the slicing exactly). */
  def mp4SampleStats(spark: SparkSession, df: DataFrame, idCol: String,
                     blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          demuxMp4Samples(bytes).iterator.zipWithIndex.map {
            case (p, i) =>
              var s = 0L
              var j = 0
              while (j < p.length) { s += (p(j) & 0xff); j += 1 }
              (id, i.toLong, p.length.toLong, s)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "sample_idx", "sample_len", "sample_sum")
  }

  /** Real MP4 container-metadata extraction over (id, blob) rows —
    * `mapPartitions` box-walk, blob never leaves the map side. */
  def mp4Meta(spark: SparkSession, df: DataFrame, idCol: String,
              blobCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (b, ts, dur, nt, w, h, ns, md) = parseMp4Meta(bytes)
          Mp4MetaRow(id, b, ts, dur, nt, w, h, ns, md)
        }
      }(Encoders.product[Mp4MetaRow])
      .toDF(idCol, "brand", "timescale", "duration_ms", "n_tracks",
        "width", "height", "n_samples", "mdat_bytes")
  }
}
