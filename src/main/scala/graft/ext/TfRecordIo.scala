package graft.ext

import graft.util.SerializableHadoopConf

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** TFRecord source/sink — THE container LLM training pipelines feed
  * accelerators from (TensorFlow/TFDS/SeqIO shard layout; T5, PaLM and
  * every TPU-era corpus shipped as `*.tfrecord`). The format is public
  * and tiny: each record is `uint64 length (LE) · masked crc32c(length)
  * · data · masked crc32c(data)`, with `data` a `tf.train.Example`
  * protobuf. Both layers are hand-rolled here on the JDK alone
  * (`java.util.zip.CRC32C` + varint arithmetic — no protobuf runtime in
  * the sandbox), covering the flat interchange subset the Example
  * schema actually has: int64 / float / bytes feature lists.
  *
  * Scale shape (the [[AvroIo]] discipline): the writer streams one
  * container per non-empty partition onto the Hadoop FS seam with
  * tmp-rename commit (first attempt wins); the reader is a `binaryFile`
  * file-per-task scan decoded map-side, framing CRCs VERIFIED on every
  * record — a flipped bit in a 100 TB corpus must surface as a loud
  * task failure, not silent token garbage. No shuffle on either path.
  *
  * Type mapping: Long/Int → Int64List, Float → FloatList,
  * String/Binary → BytesList. DoubleType is rejected loudly —
  * `tf.train.Feature` has no double list; a silent float32 downcast
  * would corrupt values, so the caller must cast intentionally. NULL
  * columns are written as an ABSENT feature (the Example convention)
  * and read back as null (nullable field) or a loud failure.
  */
object TfRecordIo {

  // ------------------------------------------------------------ crc32c
  /** TFRecord's masked crc32c (the public masking rotation). */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  // ------------------------------------------------------------ varint
  private def writeVarint(out: ByteArrayOutputStream, vIn: Long): Unit = {
    var v = vIn
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def varintLen(vIn: Long): Int = {
    var v = vIn; var n = 1
    while ((v & ~0x7fL) != 0L) { n += 1; v >>>= 7 }
    n
  }

  // ------------------------------------------------- proto wire writer
  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
                            payload: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload)
  }

  /** Encode one Feature: the oneof branch picked by the value kind. */
  private def encodeFeature(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    v match {
      case l: Long =>
        val lst = new ByteArrayOutputStream(12) // Int64List, packed value
        val body = new ByteArrayOutputStream(10)
        writeVarint(body, l)
        writeLenDelim(lst, 1, body.toByteArray)
        writeLenDelim(out, 3, lst.toByteArray)
      case f: Float =>
        val lst = new ByteArrayOutputStream(8) // FloatList, packed value
        val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putFloat(f)
        writeLenDelim(lst, 1, bb.array())
        writeLenDelim(out, 2, lst.toByteArray)
      case b: Array[Byte] =>
        val lst = new ByteArrayOutputStream(b.length + 4) // BytesList
        writeLenDelim(lst, 1, b)
        writeLenDelim(out, 1, lst.toByteArray)
      case other => throw new IllegalArgumentException(
        s"tfrecord: unsupported feature value $other")
    }
    out.toByteArray
  }

  /** Encode one row as a tf.train.Example (features map, one entry per
    * NON-NULL column). */
  def encodeExample(row: Row, st: StructType): Array[Byte] = {
    val feats = new ByteArrayOutputStream(256) // Features message
    var i = 0
    while (i < st.length) {
      if (!row.isNullAt(i)) {
        val v: Any = st.fields(i).dataType match {
          case LongType    => row.getLong(i)
          case IntegerType => row.getInt(i).toLong
          case FloatType   => row.getFloat(i)
          case StringType  => row.getString(i).getBytes(UTF_8)
          case BinaryType  => row.getAs[Array[Byte]](i)
          case DoubleType => throw new IllegalArgumentException(
            "tfrecord: tf.train.Feature has no double list — cast to " +
              "float or int64 intentionally upstream")
          case other => throw new IllegalArgumentException(
            s"tfrecord: unsupported column type $other")
        }
        val entry = new ByteArrayOutputStream(64) // map entry
        writeLenDelim(entry, 1, st.fields(i).name.getBytes(UTF_8)) // key
        writeLenDelim(entry, 2, encodeFeature(v)) // value
        writeLenDelim(feats, 1, entry.toByteArray)
      }
      i += 1
    }
    val ex = new ByteArrayOutputStream(feats.size() + 8) // Example
    writeLenDelim(ex, 1, feats.toByteArray)
    ex.toByteArray
  }

  // ------------------------------------------------- proto wire reader
  /** Minimal forward-only proto reader over a byte slice. */
  private final class PR(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        require(pos < end, "tfrecord: truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "tfrecord: varint overflow")
      }
      v // unreachable
    }
    def lenDelim(): PR = {
      val l = varint().toInt
      require(l >= 0 && pos + l <= end, "tfrecord: truncated field")
      val r = new PR(buf, pos, pos + l); pos += l; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => require(pos + 8 <= end, "tfrecord: truncated fixed64"); pos += 8
      case 2 => lenDelim()
      case 5 => require(pos + 4 <= end, "tfrecord: truncated fixed32"); pos += 4
      case w => throw new IllegalArgumentException(s"tfrecord: wire type $w")
    }
    def bytes(): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(buf, pos, end); pos = end; a
    }
    def float32(): Float = {
      require(pos + 4 <= end, "tfrecord: truncated float")
      val f = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat
      pos += 4; f
    }
  }

  /** One decoded feature: exactly one of the three lists. */
  private[ext] case class Feat(longs: Seq[Long] = Nil,
      floats: Seq[Float] = Nil, bytess: Seq[Array[Byte]] = Nil)

  /** Decode a tf.train.Example into its (name → Feature) map. Accepts
    * both packed and unpacked numeric list encodings. */
  def decodeExample(data: Array[Byte]): Map[String, Feat] = {
    def readBytesList(pr: PR): Feat = {
      var f = Feat()
      while (pr.hasMore) {
        val tag = pr.varint().toInt
        (tag >> 3, tag & 7) match {
          case (1, 2) => f = f.copy(bytess = f.bytess :+ pr.lenDelim().bytes())
          case (_, w) => pr.skip(w)
        }
      }
      f
    }
    def readFeature(pr: PR): Feat = {
      var f = Feat()
      while (pr.hasMore) {
        val tag = pr.varint().toInt
        (tag >> 3, tag & 7) match {
          case (1, 2) => f = readBytesList(pr.lenDelim()) // bytes_list
          case (2, 2) => // float_list: packed floats or per-element
            val lst = pr.lenDelim()
            var fl = f.floats
            while (lst.hasMore) {
              val t = lst.varint().toInt
              (t >> 3, t & 7) match {
                case (1, 2) => // packed
                  val p = lst.lenDelim()
                  while (p.hasMore) fl = fl :+ p.float32()
                case (1, 5) => fl = fl :+ lst.float32() // unpacked
                case (_, w) => lst.skip(w)
              }
            }
            f = f.copy(floats = fl)
          case (3, 2) => // int64_list: packed varints or per-element
            val lst = pr.lenDelim()
            var ll = f.longs
            while (lst.hasMore) {
              val t = lst.varint().toInt
              (t >> 3, t & 7) match {
                case (1, 2) => // packed
                  val p = lst.lenDelim()
                  while (p.hasMore) ll = ll :+ p.varint()
                case (1, 0) => ll = ll :+ lst.varint() // unpacked
                case (_, w) => lst.skip(w)
              }
            }
            f = f.copy(longs = ll)
          case (_, w) => pr.skip(w)
        }
      }
      f
    }
    val out = Map.newBuilder[String, Feat]
    val ex = new PR(data, 0, data.length)
    while (ex.hasMore) {
      val tag = ex.varint().toInt
      (tag >> 3, tag & 7) match {
        case (1, 2) => // Features
          val feats = ex.lenDelim()
          while (feats.hasMore) {
            val ft = feats.varint().toInt
            (ft >> 3, ft & 7) match {
              case (1, 2) => // map entry
                val entry = feats.lenDelim()
                var name: String = null
                var feat = Feat()
                while (entry.hasMore) {
                  val et = entry.varint().toInt
                  (et >> 3, et & 7) match {
                    case (1, 2) => name = new String(entry.lenDelim().bytes(), UTF_8)
                    case (2, 2) => feat = readFeature(entry.lenDelim())
                    case (_, w) => entry.skip(w)
                  }
                }
                require(name != null, "tfrecord: map entry without key")
                out += name -> feat
              case (_, w) => feats.skip(w)
            }
          }
        case (_, w) => ex.skip(w)
      }
    }
    out.result()
  }

  // ------------------------------------------------------------ framing
  /** Frame one record: length · maskedCrc(length) · data · maskedCrc(data). */
  def frame(out: ByteArrayOutputStream, data: Array[Byte]): Unit = {
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    out.write(lenBytes)
    out.write(le32(maskedCrc(lenBytes, 0, 8)))
    out.write(data)
    out.write(le32(maskedCrc(data, 0, data.length)))
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def readLe32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  /** Parse every framed record of one file, VERIFYING both CRCs —
    * corrupt or truncated segments fail the task loudly. Whole-file
    * gzip (TFRecordOptions GZIP — magic-sniffed, the [[Warc]]
    * discipline) is inflated first. */
  def parseFrames(bytesIn: Array[Byte]): Seq[Array[Byte]] = {
    val bytes =
      if (bytesIn.length >= 2 && (bytesIn(0) & 0xff) == 0x1f &&
        (bytesIn(1) & 0xff) == 0x8b) Warc.gunzipAll(bytesIn)
      else bytesIn
    val out = Vector.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 12 <= bytes.length, s"tfrecord: truncated header at $pos")
      require(readLe32(bytes, pos + 8) == maskedCrc(bytes, pos, 8),
        s"tfrecord: length crc mismatch at $pos")
      val len = ByteBuffer.wrap(bytes, pos, 8)
        .order(ByteOrder.LITTLE_ENDIAN).getLong
      require(len >= 0 && pos + 12 + len + 4 <= bytes.length,
        s"tfrecord: truncated record (len $len at $pos of ${bytes.length})")
      val data = java.util.Arrays.copyOfRange(bytes, pos + 12,
        pos + 12 + len.toInt)
      require(readLe32(bytes, pos + 12 + len.toInt) ==
        maskedCrc(data, 0, data.length),
        s"tfrecord: data crc mismatch at $pos")
      out += data
      pos += 12 + len.toInt + 4
    }
    out.result()
  }

  // --------------------------------------------------------- write/read
  /** Write `df` as `part-<pid>.tfrecord` files under `dir` — one file
    * per non-empty partition, tmp-rename commit, stale parts cleared
    * first (the [[AvroIo.write]] semantics verbatim). */
  def write(df: DataFrame, dir: String, gzipped: Boolean = false): Unit = {
    val st = df.schema
    val spark = df.sparkSession
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dfs.mkdirs(dirPath)
    val stale = dfs.globStatus(new Path(dirPath, "*.tfrecord*"))
    if (stale != null) stale.foreach(s => dfs.delete(s.getPath, false))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = TaskContext.get()
        val finalPath = new Path(dir, f"part-${tc.partitionId()}%05d.tfrecord")
        val tmpPath = new Path(dir,
          f"part-${tc.partitionId()}%05d.tfrecord.${tc.taskAttemptId()}%d.tmp")
        val fs = finalPath.getFileSystem(conf.value)
        val raw = fs.create(tmpPath, true)
        // TFRecordOptions GZIP = whole-file gzip around the framing
        val out: java.io.OutputStream =
          if (gzipped) new java.util.zip.GZIPOutputStream(raw, 1 << 16)
          else raw
        try {
          val buf = new ByteArrayOutputStream(1 << 16)
          it.foreach { row =>
            frame(buf, encodeExample(row, st))
            if (buf.size() >= (1 << 16)) { buf.writeTo(out); buf.reset() }
          }
          if (buf.size() > 0) buf.writeTo(out)
        } finally out.close()
        if (!fs.rename(tmpPath, finalPath)) {
          fs.delete(tmpPath, false)
          if (!fs.exists(finalPath)) throw new java.io.IOException(
            s"tfrecord commit failed: could not rename $tmpPath to $finalPath")
        }
      }
    }
  }

  /** Read every `*.tfrecord` under `dir` with the given read schema:
    * file-per-task `binaryFile` scan, map-side frame parse + Example
    * decode, field lookup BY NAME. A missing feature reads as null for
    * a nullable field and fails fast otherwise; a feature of the wrong
    * kind always fails fast. */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    val fields = st.fields
    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord").load(dir)
      .select("content")
    val enc = Encoders.row(st)
    blobs.as(Encoders.BINARY).mapPartitions { it =>
      it.flatMap { bytes =>
        parseFrames(bytes).iterator.map { data =>
          val feats = decodeExample(data)
          val vals = new Array[Any](fields.length)
          var i = 0
          while (i < fields.length) {
            val f = fields(i)
            vals(i) = feats.get(f.name) match {
              case None =>
                if (f.nullable) null
                else throw new IllegalArgumentException(
                  s"tfrecord: missing required feature '${f.name}'")
              case Some(ft) => f.dataType match {
                case LongType    => one(ft.longs, f.name)
                case IntegerType => one(ft.longs, f.name).toInt
                case FloatType   => one(ft.floats, f.name)
                case StringType  => new String(one(ft.bytess, f.name), UTF_8)
                case BinaryType  => one(ft.bytess, f.name)
                case other => throw new IllegalArgumentException(
                  s"tfrecord: unsupported read type $other")
              }
            }
            i += 1
          }
          new GenericRowWithSchema(vals, st): Row
        }
      }
    }(enc)
  }

  private def one[T](xs: Seq[T], name: String): T = {
    require(xs.length == 1,
      s"tfrecord: feature '$name' has ${xs.length} values, expected 1")
    xs.head
  }
}
