package graft.ext

import graft.util.SerializableHadoopConf

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}
import scala.collection.mutable.ArrayBuffer

/** TFRecord source/sink — THE container LLM training pipelines feed
  * accelerators from (TensorFlow/TFDS/SeqIO shard layout; T5, PaLM and
  * every TPU-era corpus shipped as `*.tfrecord`). The format is public
  * and tiny: each record is `uint64 length (LE) · masked crc32c(length)
  * · data · masked crc32c(data)`, with `data` a `tf.train.Example`
  * protobuf. Both layers are hand-rolled here on the JDK alone
  * (`java.util.zip.CRC32C` + varint arithmetic — no protobuf runtime in
  * the sandbox), covering the interchange subset the Example schema
  * actually has: int64 / float / bytes feature LISTS — including the
  * payload an LLM pipeline actually ships, the packed token-id sequence
  * (`int64_list` of thousands of ids per example), mapped to Spark
  * `ArrayType` columns.
  *
  * Scale shape (the [[AvroIo]] discipline): the writer streams one
  * container per non-empty partition onto the Hadoop FS seam with
  * tmp-rename commit (first attempt wins); the reader is a `binaryFile`
  * file-per-task scan decoded map-side, framing CRCs VERIFIED on every
  * record — a flipped bit in a 100 TB corpus must surface as a loud
  * task failure, not silent token garbage. Records are STREAMED off the
  * (possibly decompressing) input one at a time ([[frameIterator]]), so
  * peak residency per task is the compressed blob plus one record —
  * never a second inflated copy of the whole shard. No shuffle on
  * either path.
  *
  * Compression is EXTENSION-KEYED, never sniffed on the primary path:
  * the framing is byte-ambiguous with the gzip magic (a raw file whose
  * first record length ≡ 35615 mod 2^16 also starts `1f 8b`), which is
  * why real TFRecord readers never sniff. The writer names compressed
  * shards `.tfrecord.gz` / `.tfrecord.zst` (TFRecordOptions GZIP, plus
  * the zstd twin Dolma/RedPajama-era corpora ship) and the reader keys
  * decompression off the extension; a legacy bare `.tfrecord` that
  * starts with the gzip magic is TRIED as gzip and falls back to raw
  * framing when the gzip layer itself rejects the bytes.
  *
  * Type mapping: Long/Int → Int64List, Float → FloatList,
  * String/Binary → BytesList; `ArrayType` of each maps to the same
  * list with ALL elements (written packed for int64/float — the
  * protobuf encoding TensorFlow emits — with unpacked accepted on
  * read). DoubleType is rejected loudly — `tf.train.Feature` has no
  * double list; a silent float32 downcast would corrupt values, so the
  * caller must cast intentionally. Int64 values outside Int range fail
  * loudly on an IntegerType read (`Math.toIntExact`), never truncate.
  * NULL columns are written as an ABSENT feature (the Example
  * convention) and read back as null (nullable field) or a loud
  * failure; null ELEMENTS inside an array are rejected — Example lists
  * cannot hold them. An EMPTY array round-trips as a present feature
  * whose list is empty (distinct from absent = null).
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

  // ------------------------------------------------- proto wire writer
  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
                            payload: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload)
  }

  // Feature encoders, one per oneof branch. Numeric lists are written
  // PACKED (field 1, wire 2 — what TensorFlow emits); an empty list
  // writes the branch with no values, so presence survives the trip.
  private def featureInt64(vs: Iterator[Long], sizeHint: Int): Array[Byte] = {
    val body = new ByteArrayOutputStream(sizeHint * 2 + 8)
    vs.foreach(writeVarint(body, _))
    val lst = new ByteArrayOutputStream(body.size() + 6)
    if (body.size() > 0) writeLenDelim(lst, 1, body.toByteArray)
    val out = new ByteArrayOutputStream(lst.size() + 6)
    writeLenDelim(out, 3, lst.toByteArray) // Feature.int64_list
    out.toByteArray
  }

  private def featureFloat(vs: Iterator[Float], sizeHint: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(math.max(sizeHint, 1) * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    var n = 0
    vs.foreach { f => bb.putFloat(f); n += 1 }
    val lst = new ByteArrayOutputStream(n * 4 + 6)
    if (n > 0) writeLenDelim(lst, 1,
      java.util.Arrays.copyOf(bb.array(), n * 4))
    val out = new ByteArrayOutputStream(lst.size() + 6)
    writeLenDelim(out, 2, lst.toByteArray) // Feature.float_list
    out.toByteArray
  }

  private def featureBytes(vs: Iterator[Array[Byte]]): Array[Byte] = {
    val lst = new ByteArrayOutputStream(64)
    vs.foreach(writeLenDelim(lst, 1, _)) // BytesList.value, repeated
    val out = new ByteArrayOutputStream(lst.size() + 6)
    writeLenDelim(out, 1, lst.toByteArray) // Feature.bytes_list
    out.toByteArray
  }

  private def noDoubles(what: String): Nothing =
    throw new IllegalArgumentException(
      s"tfrecord: tf.train.Feature has no double list ($what) — cast to " +
        "float or int64 intentionally upstream")

  /** Encode one row as a tf.train.Example (features map, one entry per
    * NON-NULL column; array columns become multi-value lists). */
  def encodeExample(row: Row, st: StructType): Array[Byte] = {
    val feats = new ByteArrayOutputStream(256) // Features message
    var i = 0
    while (i < st.length) {
      if (!row.isNullAt(i)) {
        val name = st.fields(i).name
        val fb: Array[Byte] = st.fields(i).dataType match {
          case LongType    => featureInt64(Iterator.single(row.getLong(i)), 1)
          case IntegerType => featureInt64(Iterator.single(row.getInt(i).toLong), 1)
          case FloatType   => featureFloat(Iterator.single(row.getFloat(i)), 1)
          case StringType  => featureBytes(Iterator.single(row.getString(i).getBytes(UTF_8)))
          case BinaryType  => featureBytes(Iterator.single(row.getAs[Array[Byte]](i)))
          case ArrayType(et, _) =>
            val xs = row.getSeq[Any](i)
            if (xs.exists(_ == null)) throw new IllegalArgumentException(
              s"tfrecord: null element in array feature '$name' — " +
                "tf.train.Example lists cannot hold null")
            et match {
              case LongType =>
                featureInt64(xs.iterator.map(_.asInstanceOf[Long]), xs.size)
              case IntegerType =>
                featureInt64(xs.iterator.map(_.asInstanceOf[Int].toLong), xs.size)
              case FloatType =>
                featureFloat(xs.iterator.map(_.asInstanceOf[Float]), xs.size)
              case StringType =>
                featureBytes(xs.iterator.map(_.asInstanceOf[String].getBytes(UTF_8)))
              case BinaryType =>
                featureBytes(xs.iterator.map(_.asInstanceOf[Array[Byte]]))
              case DoubleType => noDoubles(s"array column '$name'")
              case other => throw new IllegalArgumentException(
                s"tfrecord: unsupported array element type $other in '$name'")
            }
          case DoubleType => noDoubles(s"column '$name'")
          case other => throw new IllegalArgumentException(
            s"tfrecord: unsupported column type $other in '$name'")
        }
        val entry = new ByteArrayOutputStream(fb.length + 32) // map entry
        writeLenDelim(entry, 1, name.getBytes(UTF_8)) // key
        writeLenDelim(entry, 2, fb) // value
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
    * both packed and unpacked numeric list encodings; list values are
    * accumulated in builders (O(k) for a k-element token-id list). */
  def decodeExample(data: Array[Byte]): Map[String, Feat] = {
    def readFeature(pr: PR): Feat = {
      val longs = new ArrayBuffer[Long]
      val floats = new ArrayBuffer[Float]
      val bytess = new ArrayBuffer[Array[Byte]]
      while (pr.hasMore) {
        val tag = pr.varint().toInt
        (tag >> 3, tag & 7) match {
          case (1, 2) => // bytes_list
            val lst = pr.lenDelim()
            while (lst.hasMore) {
              val t = lst.varint().toInt
              (t >> 3, t & 7) match {
                case (1, 2) => bytess += lst.lenDelim().bytes()
                case (_, w) => lst.skip(w)
              }
            }
          case (2, 2) => // float_list: packed floats or per-element
            val lst = pr.lenDelim()
            while (lst.hasMore) {
              val t = lst.varint().toInt
              (t >> 3, t & 7) match {
                case (1, 2) => // packed
                  val p = lst.lenDelim()
                  while (p.hasMore) floats += p.float32()
                case (1, 5) => floats += lst.float32() // unpacked
                case (_, w) => lst.skip(w)
              }
            }
          case (3, 2) => // int64_list: packed varints or per-element
            val lst = pr.lenDelim()
            while (lst.hasMore) {
              val t = lst.varint().toInt
              (t >> 3, t & 7) match {
                case (1, 2) => // packed
                  val p = lst.lenDelim()
                  while (p.hasMore) longs += p.varint()
                case (1, 0) => longs += lst.varint() // unpacked
                case (_, w) => lst.skip(w)
              }
            }
          case (_, w) => pr.skip(w)
        }
      }
      Feat(longs.toSeq, floats.toSeq, bytess.toSeq)
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

  /** Read exactly `n` bytes into `buf`. Throws on EOF mid-read; a clean
    * EOF before the FIRST byte returns false only when `optional`. */
  private def readFully(in: InputStream, buf: Array[Byte], n: Int,
                        what: String, off: Long, optional: Boolean): Boolean = {
    var got = 0
    while (got < n) {
      val r = in.read(buf, got, n - got)
      if (r < 0) {
        if (got == 0 && optional) return false
        throw new IllegalArgumentException(
          s"tfrecord: truncated $what at offset $off (eof after $got of $n bytes)")
      }
      got += r
    }
    true
  }

  /** Stream framed records off `in`, VERIFYING both CRCs per record —
    * corrupt or truncated segments fail the task loudly. One record is
    * resident at a time, so a gzip/zstd-wrapped stream never
    * materializes a second inflated copy of the whole shard. */
  def frameIterator(in: InputStream): Iterator[Array[Byte]] =
    new scala.collection.AbstractIterator[Array[Byte]] {
      private val head = new Array[Byte](12)
      private val crcBuf = new Array[Byte](4)
      private var off = 0L // decompressed offset, for loud messages
      private var nextRec: Array[Byte] = _
      private def advance(): Unit = {
        if (!readFully(in, head, 12, "header", off, optional = true)) {
          nextRec = null
          // close at clean EOF: decompressor wrappers (zstd-jni
          // especially) hold native memory that must not wait for GC
          try in.close() catch { case _: Throwable => () }
          return
        }
        require(readLe32(head, 8) == maskedCrc(head, 0, 8),
          s"tfrecord: length crc mismatch at offset $off")
        val len = ByteBuffer.wrap(head, 0, 8)
          .order(ByteOrder.LITTLE_ENDIAN).getLong
        require(len >= 0 && len <= Int.MaxValue - 16,
          s"tfrecord: implausible record length $len at offset $off")
        val data = new Array[Byte](len.toInt)
        readFully(in, data, len.toInt, "record", off, optional = false)
        readFully(in, crcBuf, 4, "record crc", off, optional = false)
        require(readLe32(crcBuf, 0) == maskedCrc(data, 0, data.length),
          s"tfrecord: data crc mismatch at offset $off")
        off += 12 + len + 4
        nextRec = data
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Array[Byte] = {
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; advance(); r
      }
    }

  /** Parse every framed record of a byte buffer. A LEGACY bare
    * `.tfrecord` that starts with the gzip magic is tried as
    * whole-file gzip first (the r14 writer named gzipped shards
    * `.tfrecord`); because raw framing is byte-ambiguous with the
    * magic (a first record of 35615+2^16·k bytes also starts `1f 8b`),
    * a failure OF THE GZIP LAYER falls back to raw framing — a frame
    * CRC failure inside a stream that inflated cleanly stays loud. */
  def parseFrames(bytesIn: Array[Byte]): Seq[Array[Byte]] = {
    def raw = frameIterator(new ByteArrayInputStream(bytesIn)).toVector
    if (bytesIn.length >= 2 && (bytesIn(0) & 0xff) == 0x1f &&
      (bytesIn(1) & 0xff) == 0x8b) {
      try frameIterator(new GZIPInputStream(
        new ByteArrayInputStream(bytesIn), 64 * 1024)).toVector
      catch { case _: java.io.IOException => raw }
    } else raw
  }

  /** Extension-keyed frame stream for one file (see object doc):
    * `.tfrecord.gz` / `.tfrecord.zst` decompress STREAMING; a bare
    * `.tfrecord` goes through [[parseFrames]]' sniff-with-fallback. */
  private[ext] def framesOf(path: String, bytes: Array[Byte]): Iterator[Array[Byte]] =
    if (path.endsWith(".tfrecord.gz"))
      frameIterator(new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024))
    else if (path.endsWith(".tfrecord.zst"))
      frameIterator(new ZstdInputStream(new ByteArrayInputStream(bytes)))
    else parseFrames(bytes).iterator

  // --------------------------------------------------------- write/read
  /** File extension for a codec name — the reader keys decompression
    * off this, never a magic sniff (framing is gzip-magic-ambiguous). */
  private def extOf(codec: String): String = codec match {
    case "none" => ".tfrecord"
    case "gzip" => ".tfrecord.gz"
    case "zstd" => ".tfrecord.zst"
    case other => throw new IllegalArgumentException(
      s"tfrecord: unknown codec '$other' (none|gzip|zstd)")
  }

  /** Write `df` as `part-<pid>[-<k>].tfrecord[.gz|.zst]` files under
    * `dir` — one file per non-empty partition (rolling to a new file
    * every `maxRecordsPerFile` records when set: the TFDS bounded-shard
    * layout, so downstream readers and trainers get uniformly sized
    * shards regardless of upstream partition skew), tmp-rename commit
    * per file, stale parts cleared first (the [[AvroIo.write]]
    * semantics verbatim). */
  def write(df: DataFrame, dir: String, codec: String = "none",
            maxRecordsPerFile: Long = Long.MaxValue): Unit = {
    require(maxRecordsPerFile >= 1, "tfrecord: maxRecordsPerFile must be >= 1")
    val ext = extOf(codec)
    val st = df.schema
    val spark = df.sparkSession
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dfs.mkdirs(dirPath)
    val stale = dfs.globStatus(new Path(dirPath, "*.tfrecord*"))
    if (stale != null) stale.foreach(s => dfs.delete(s.getPath, false))
    val rollEvery = maxRecordsPerFile
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        // single-file partitions keep the bare part-<pid> name (the
        // r14 layout); rolled shards append a chunk index
        def nameOf(chunk: Long): String =
          if (rollEvery == Long.MaxValue) f"part-$pid%05d$ext"
          else f"part-$pid%05d-$chunk%04d$ext"
        val fs = new Path(dir).getFileSystem(conf.value)
        def commitChunk(chunk: Long, body: java.io.OutputStream => Unit): Unit = {
          val finalPath = new Path(dir, nameOf(chunk))
          val tmpPath = new Path(dir,
            s"${nameOf(chunk)}.${tc.taskAttemptId()}.tmp")
          val raw = fs.create(tmpPath, true)
          val out: java.io.OutputStream = codec match {
            case "gzip" => new GZIPOutputStream(raw, 1 << 16)
            case "zstd" => new ZstdOutputStream(raw)
            case _ => raw
          }
          try body(out) finally out.close()
          if (!fs.rename(tmpPath, finalPath)) {
            fs.delete(tmpPath, false)
            if (!fs.exists(finalPath)) throw new java.io.IOException(
              s"tfrecord commit failed: could not rename $tmpPath to $finalPath")
          }
        }
        var chunk = 0L
        while (it.hasNext) {
          commitChunk(chunk, { out =>
            val buf = new ByteArrayOutputStream(1 << 16)
            var n = 0L
            while (it.hasNext && n < rollEvery) {
              frame(buf, encodeExample(it.next(), st))
              n += 1
              if (buf.size() >= (1 << 16)) { buf.writeTo(out); buf.reset() }
            }
            if (buf.size() > 0) buf.writeTo(out)
          })
          chunk += 1
        }
      }
    }
  }

  /** Read every `*.tfrecord[.gz|.zst]` under `dir` with the given read
    * schema: file-per-task `binaryFile` scan, map-side STREAMING frame
    * parse + Example decode, field lookup BY NAME. A missing feature
    * reads as null for a nullable field and fails fast otherwise; a
    * feature of the wrong kind, or an int64 outside Int range read as
    * IntegerType, always fails fast. Array fields return the FULL
    * list; an empty list reads as an empty array (kind is ambiguous
    * only when every list is empty, which is harmless — all empty
    * lists are the same value). */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    val fields = st.fields
    requireShardsFit(spark, dir,
      Seq(".tfrecord", ".tfrecord.gz", ".tfrecord.zst"))
    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{tfrecord,tfrecord.gz,tfrecord.zst}")
      .load(dir)
      .select("path", "content")
    val enc = Encoders.row(st)
    blobs.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          framesOf(path, bytes).map { data =>
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
                  case IntegerType => Math.toIntExact(one(ft.longs, f.name))
                  case FloatType   => one(ft.floats, f.name)
                  case StringType  => new String(one(ft.bytess, f.name), UTF_8)
                  case BinaryType  => one(ft.bytess, f.name)
                  case ArrayType(LongType, _) => list(ft.longs, ft, f.name)
                  case ArrayType(IntegerType, _) =>
                    list(ft.longs, ft, f.name).map(Math.toIntExact)
                  case ArrayType(FloatType, _) => list(ft.floats, ft, f.name)
                  case ArrayType(StringType, _) =>
                    list(ft.bytess, ft, f.name).map(new String(_, UTF_8))
                  case ArrayType(BinaryType, _) => list(ft.bytess, ft, f.name)
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

  /** Infer a read schema from the shards themselves — the reference's
    * dynamic-schema theme (per-batch `spark.read.json` inference,
    * `glue/cdc_hudi.py:234`) applied to the container: sample up to
    * `sampleRecords` Examples from the head of EVERY shard (streamed,
    * never whole-file — a feature first appearing in a later shard
    * must not silently drop from the schema and lose its column),
    * union their feature kinds, and map int64 → `ArrayType(LongType)`,
    * float → `ArrayType(FloatType)`, bytes → `ArrayType(BinaryType)`.
    * Lists are the SAFE SUPERSET: the Example encoding cannot
    * distinguish a scalar from a 1-element list, so inference never
    * guesses scalar (a caller selecting `element_at(c, 1)` recovers
    * the scalar view losslessly). A feature whose sampled lists are
    * all empty is kindless and defaults to `ArrayType(BinaryType)`; a
    * feature sampled with TWO kinds fails loudly, naming the shard.
    * Fields sort by name, all nullable (absent features exist by
    * design). Cost: O(shards × sampleRecords) bounded head reads off
    * the driver — fine up to tens of thousands of shards; past that,
    * supply an explicit schema (the production contract anyway). A
    * feature appearing only PAST a shard's sampled head is still
    * invisible — that residual bound is the disclosed contract. */
  def inferSchema(spark: SparkSession, dir: String,
                  sampleRecords: Int = 100): StructType = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = Seq(".tfrecord", ".tfrecord.gz", ".tfrecord.zst")
      .flatMap(ext => Option(fs.globStatus(new Path(dirPath, s"*$ext")))
        .toSeq.flatten)
      .map(_.getPath).sortBy(_.getName)
    require(shards.nonEmpty, s"tfrecord: no shards under $dir to infer from")
    val kinds = scala.collection.mutable.Map.empty[String, DataType]
    for (shard <- shards) {
      val raw = fs.open(shard)
      val in: InputStream = shard.getName match {
        case n if n.endsWith(".tfrecord.gz") => new GZIPInputStream(raw, 64 * 1024)
        case n if n.endsWith(".tfrecord.zst") => new ZstdInputStream(raw)
        case _ => raw
      }
      try {
        frameIterator(new java.io.BufferedInputStream(in, 64 * 1024))
          .take(sampleRecords).foreach { data =>
            decodeExample(data).foreach { case (name, ft) =>
              val kind: Option[DataType] =
                if (ft.longs.nonEmpty) Some(ArrayType(LongType))
                else if (ft.floats.nonEmpty) Some(ArrayType(FloatType))
                else if (ft.bytess.nonEmpty) Some(ArrayType(BinaryType))
                else None // empty list: kindless
              kind.foreach { k =>
                kinds.get(name) match {
                  case Some(prev) if prev != null && prev != k =>
                    throw new IllegalArgumentException(
                      s"tfrecord: feature '$name' sampled with two kinds " +
                        s"($prev vs $k, second in ${shard.getName}) — " +
                        "cannot infer")
                  case _ => kinds(name) = k
                }
              }
              if (!kinds.contains(name) && kind.isEmpty)
                kinds(name) = null // seen, kind pending
            }
          }
      } finally in.close()
    }
    val fields = kinds.toSeq.sortBy(_._1).map { case (name, dt) =>
      StructField(name,
        if (dt == null) ArrayType(BinaryType) else dt, nullable = true)
    }
    StructType(fields)
  }

  /** `binaryFile` materializes each shard as ONE byte array, so even a
    * COMPRESSED shard must fit the JVM array bound although inflation
    * streams (r15). A shard past the bound would otherwise die in an
    * opaque allocation failure deep in the scan; list the dir up front
    * (status-only, no data read) and fail loudly naming the file and
    * the remedy. The same bound applies to any blob fed to
    * [[Warc.records]] / [[Jsonl.docs]] — production shard sizing
    * should stay at the vendor-conventional ~1 GiB. Shared by the other
    * dir-level binaryFile reader ([[AvroIo.read]]) via `label`. */
  private[ext] def requireShardsFit(spark: SparkSession, dir: String,
      exts: Seq[String], bound: Long = Int.MaxValue - 8,
      label: String = "tfrecord"): Unit = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val over = exts
      .flatMap(ext => Option(fs.globStatus(new Path(dirPath, s"*$ext")))
        .toSeq.flatten)
      .filter(_.getLen > bound)
    require(over.isEmpty,
      s"$label: shard ${over.headOption.map(_.getPath).orNull} is " +
        s"${over.headOption.map(_.getLen).getOrElse(0L)} bytes, over the " +
        s"$bound-byte single-array read bound (binaryFile materializes " +
        "one array per file) - write smaller shards (maxRecordsPerFile) " +
        "or split the file")
  }

  private def one[T](xs: Seq[T], name: String): T = {
    require(xs.length == 1,
      s"tfrecord: feature '$name' has ${xs.length} values, expected 1")
    xs.head
  }

  /** Full list of the asked kind; loud when the feature holds values
    * of a DIFFERENT kind (all-empty is genuinely kindless: fine). */
  private def list[T](xs: Seq[T], ft: Feat, name: String): Seq[T] = {
    if (xs.isEmpty)
      require(ft.longs.isEmpty && ft.floats.isEmpty && ft.bytess.isEmpty,
        s"tfrecord: feature '$name' holds values of a different kind " +
          s"(${ft.longs.length} int64 / ${ft.floats.length} float / " +
          s"${ft.bytess.length} bytes)")
    xs
  }
}
