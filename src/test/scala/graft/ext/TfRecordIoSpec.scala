package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpecBase

/** TFRecord framing + tf.train.Example codec ([[TfRecordIo]]):
  * known-answer CRC, loud corruption/truncation failures, packed and
  * unpacked list decoding, null/absent features, type guards. */
class TfRecordIoSpec extends SparkSpecBase {

  private val st = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("txt", StringType, nullable = true),
    StructField("w", FloatType, nullable = true)))

  private def ex(id: Long, txt: String, w: java.lang.Float): Array[Byte] =
    TfRecordIo.encodeExample(Row(id, txt, w), st)

  test("crc32c base matches the published check value") {
    // CRC-32C("123456789") = 0xE3069283 \u2014 the standard check vector;
    // the TFRecord mask is the rotation+constant on top of it.
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes(UTF_8))
    assert(c.getValue === 0xE3069283L)
    val masked = TfRecordIo.maskedCrc("123456789".getBytes(UTF_8), 0, 9)
    val crc = 0xE3069283
    assert(masked === ((crc >>> 15) | (crc << 17)) + 0xa282ead8)
  }

  test("frame \u2192 parse round-trips; multiple records per file") {
    val out = new ByteArrayOutputStream()
    val recs = Seq(ex(1L, "hello", 1.5f), ex(2L, null, null), ex(3L, "x", 0f))
    recs.foreach(TfRecordIo.frame(out, _))
    val back = TfRecordIo.parseFrames(out.toByteArray)
    assert(back.map(_.toSeq) === recs.map(_.toSeq))
  }

  test("example decode: values, absent feature = null") {
    val m1 = TfRecordIo.decodeExample(ex(7L, "h\u00e9llo", 2.25f))
    assert(m1("id").longs === Seq(7L))
    assert(new String(m1("txt").bytess.head, UTF_8) === "h\u00e9llo")
    assert(m1("w").floats === Seq(2.25f))
    val m2 = TfRecordIo.decodeExample(ex(7L, null, null))
    assert(!m2.contains("txt") && !m2.contains("w"))
  }

  test("a flipped data byte fails the CRC loudly") {
    val out = new ByteArrayOutputStream()
    TfRecordIo.frame(out, ex(1L, "abc", null))
    val bytes = out.toByteArray
    bytes(14) = (bytes(14) ^ 0x01).toByte // inside the data section
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.parseFrames(bytes)
    }
    assert(e.getMessage.contains("crc mismatch"))
  }

  test("truncation fails loudly, never silently drops the tail") {
    val out = new ByteArrayOutputStream()
    TfRecordIo.frame(out, ex(1L, "abc", null))
    val bytes = out.toByteArray
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.parseFrames(java.util.Arrays.copyOf(bytes, bytes.length - 2))
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("unpacked int64/float list encodings decode too") {
    // hand-build an Example with UNPACKED lists (tag wire 0 / 5):
    // Example{Features{entry{key="n", Feature{Int64List{value:5 value:6}}}}}
    def b(xs: Int*) = xs.map(_.toByte).toArray
    val int64List = b(0x08, 5, 0x08, 6) // two unpacked varints
    val feature = b(0x1a, int64List.length) ++ int64List
    val key = "n".getBytes(UTF_8)
    val entry = b(0x0a, key.length) ++ key ++ b(0x12, feature.length) ++ feature
    val features = b(0x0a, entry.length) ++ entry
    val example = b(0x0a, features.length) ++ features
    assert(TfRecordIo.decodeExample(example)("n").longs === Seq(5L, 6L))
  }

  test("doubles are rejected loudly (no silent float32 downcast)") {
    val dst = StructType(Seq(StructField("d", DoubleType)))
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.encodeExample(Row(1.5d), dst)
    }
    assert(e.getMessage.contains("double"))
  }

  test("spark write/read round-trip preserves rows and nulls") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-spec").toString
    val df = Seq((1L, "a", Some(1.5f)), (2L, "b", None), (3L, "", Some(0f)))
      .toDF("id", "txt", "wo")
      .selectExpr("id", "txt", "CAST(wo AS FLOAT) AS w")
    TfRecordIo.write(df.repartition(2), dir)
    val back = TfRecordIo.read(spark, dir, df.schema)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(back.toSeq === Seq((1L, "a", Some(1.5f)), (2L, "b", None),
      (3L, "", Some(0f))))
  }

  test("gzipped files are named .tfrecord.gz and round-trip (extension-keyed)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-gz").toString
    val df = Seq((1L, "a"), (2L, "bb")).toDF("id", "txt")
    TfRecordIo.write(df.repartition(1), dir, codec = "gzip")
    // the on-disk file carries the extension AND really is gzip
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord.gz")).head
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(2)
    assert((head(0) & 0xff) === 0x1f && (head(1) & 0xff) === 0x8b)
    val back = TfRecordIo.read(spark, dir, df.schema)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((1L, "a"), (2L, "bb")))
  }

  test("zstd files are named .tfrecord.zst and round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-zst").toString
    val df = Seq((1L, "a"), (2L, "bb")).toDF("id", "txt")
    TfRecordIo.write(df.repartition(1), dir, codec = "zstd")
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord.zst")).head
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(4)
    assert((head(0) & 0xff) === 0x28 && (head(1) & 0xff) === 0xb5 &&
      (head(2) & 0xff) === 0x2f && (head(3) & 0xff) === 0xfd)
    val back = TfRecordIo.read(spark, dir, df.schema)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((1L, "a"), (2L, "bb")))
  }

  test("a raw file whose first record length collides with the gzip magic " +
    "still parses (sniff falls back to raw framing)") {
    // len = 35615 = 0x8b1f -> little-endian length bytes start 1f 8b,
    // the byte-ambiguity ADVICE flagged; the gzip layer rejects it
    // (CM byte = 0) and the reader must fall back to raw framing.
    val data = new Array[Byte](35615)
    java.util.Arrays.fill(data, 'x'.toByte)
    val out = new ByteArrayOutputStream()
    TfRecordIo.frame(out, data)
    val bytes = out.toByteArray
    assert((bytes(0) & 0xff) === 0x1f && (bytes(1) & 0xff) === 0x8b)
    val back = TfRecordIo.parseFrames(bytes)
    assert(back.size === 1 && back.head.length === 35615)
  }

  test("a frame CRC failure inside a genuinely gzipped file stays loud " +
    "(no silent raw-framing fallback)") {
    val rec = new ByteArrayOutputStream()
    TfRecordIo.frame(rec, ex(1L, "abc", null))
    val framed = rec.toByteArray
    framed(14) = (framed(14) ^ 0x01).toByte // corrupt the data section
    val gz = Warc.gzip(framed) // inflates cleanly; frames are corrupt
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.parseFrames(gz)
    }
    assert(e.getMessage.contains("crc mismatch"))
  }

  // ---- list features (the token-id-sequence payload) -----------------

  private val lst = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ids", ArrayType(LongType), nullable = true),
    StructField("ws", ArrayType(FloatType), nullable = true),
    StructField("ss", ArrayType(StringType), nullable = true)))

  test("array columns round-trip as multi-value lists, incl. empty vs absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-arr").toString
    val df = Seq(
      (1L, Seq(5L, 6L, 7L), Seq(1.5f, -2f), Seq("a", "", "c")),
      (2L, Seq.empty[Long], Seq.empty[Float], Seq.empty[String]),
      (3L, Seq(Long.MaxValue, Long.MinValue, -1L), Seq(0f), Seq("z")))
      .toDF("id", "ids", "ws", "ss")
    TfRecordIo.write(df.repartition(2), dir)
    val back = TfRecordIo.read(spark, dir, df.schema)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Float](2),
        r.getSeq[String](3)))
    assert(back.toSeq === Seq(
      (1L, Seq(5L, 6L, 7L), Seq(1.5f, -2f), Seq("a", "", "c")),
      (2L, Seq(), Seq(), Seq()),
      (3L, Seq(Long.MaxValue, Long.MinValue, -1L), Seq(0f), Seq("z"))))
    // a NULL array is an absent feature, distinct from present-empty
    val df2 = Seq((9L, Option.empty[Seq[Long]])).toDF("id", "ids")
    val dir2 = java.nio.file.Files.createTempDirectory("tfrec-arr2").toString
    TfRecordIo.write(df2, dir2)
    val r2 = TfRecordIo.read(spark, dir2,
      StructType(lst.fields.take(2))).collect()
    assert(r2.length === 1 && r2(0).isNullAt(1))
  }

  test("packed and unpacked int64 list encodings decode identically on long lists") {
    val n = 5000
    val vals = (0 until n).map(i => (i % 250).toLong)
    // packed: one length-delimited blob of varints (what the writer emits)
    val packedBody = new ByteArrayOutputStream()
    vals.foreach(v => writeVar(packedBody, v.toInt))
    val packed = {
      val lst = new ByteArrayOutputStream()
      lst.write(0x0a); writeVar(lst, packedBody.size()); packedBody.writeTo(lst)
      lst.toByteArray
    }
    // unpacked: tag 0x08 before every value
    val unpackedLst = new ByteArrayOutputStream()
    vals.foreach { v => unpackedLst.write(0x08); writeVar(unpackedLst, v.toInt) }
    def example(int64List: Array[Byte]): Array[Byte] = {
      val feature = new ByteArrayOutputStream()
      feature.write(0x1a); writeVar(feature, int64List.length)
      feature.write(int64List)
      val key = "n".getBytes(UTF_8)
      val entry = new ByteArrayOutputStream()
      entry.write(0x0a); writeVar(entry, key.length); entry.write(key)
      entry.write(0x12); writeVar(entry, feature.size())
      feature.writeTo(entry)
      val features = new ByteArrayOutputStream()
      features.write(0x0a); writeVar(features, entry.size())
      entry.writeTo(features)
      val exb = new ByteArrayOutputStream()
      exb.write(0x0a); writeVar(exb, features.size())
      features.writeTo(exb)
      exb.toByteArray
    }
    val fromPacked = TfRecordIo.decodeExample(example(packed))("n").longs
    val fromUnpacked = TfRecordIo.decodeExample(example(unpackedLst.toByteArray))("n").longs
    assert(fromPacked === vals)
    assert(fromUnpacked === vals)
    // and the writer's own packed encoding decodes to the same list
    val st2 = StructType(Seq(StructField("n", ArrayType(LongType))))
    val own = TfRecordIo.decodeExample(
      TfRecordIo.encodeExample(Row(vals), st2))("n").longs
    assert(own === vals)
  }

  private def writeVar(out: ByteArrayOutputStream, vIn: Int): Unit = {
    var v = vIn.toLong
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  test("null elements inside an array are rejected loudly") {
    val st2 = StructType(Seq(StructField("n", ArrayType(LongType))))
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.encodeExample(Row(Seq[Any](1L, null, 3L)), st2)
    }
    assert(e.getMessage.contains("null element"))
  }

  test("array-of-double is rejected loudly like scalar double") {
    val st2 = StructType(Seq(StructField("d", ArrayType(DoubleType))))
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.encodeExample(Row(Seq(1.5d)), st2)
    }
    assert(e.getMessage.contains("double"))
  }

  test("int64 outside Int range read as IntegerType fails loudly, never truncates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-int").toString
    val df = Seq((1L, 5000000000L)).toDF("id", "big")
    TfRecordIo.write(df, dir)
    val st2 = StructType(Seq(
      StructField("id", LongType), StructField("big", IntegerType)))
    val e = intercept[Exception] {
      TfRecordIo.read(spark, dir, st2).collect()
    }
    assert(e.getMessage != null) // ArithmeticException("integer overflow") wrapped by Spark
  }

  test("reading a list of the wrong kind fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-kind").toString
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "n")
    TfRecordIo.write(df, dir)
    val e = intercept[Exception] {
      TfRecordIo.read(spark, dir, StructType(Seq(
        StructField("id", LongType), StructField("n", ArrayType(FloatType))))).collect()
    }
    assert(e.getMessage != null)
  }

  test("frame iterator streams lazily: earlier records are served before " +
    "a later corrupt record is reached") {
    val out = new ByteArrayOutputStream()
    TfRecordIo.frame(out, ex(1L, "good", null))
    TfRecordIo.frame(out, ex(2L, "also-good", null))
    TfRecordIo.frame(out, ex(3L, "bad", null))
    val bytes = out.toByteArray
    bytes(bytes.length - 6) = (bytes(bytes.length - 6) ^ 0x01).toByte
    val it = TfRecordIo.frameIterator(new java.io.ByteArrayInputStream(bytes))
    // record 1 decodes fine (advance() prefetches ONE record, record 2)
    val first = TfRecordIo.decodeExample(it.next())
    assert(first("id").longs === Seq(1L))
    // serving record 2 prefetches the corrupt record 3 -> loud failure
    val e = intercept[IllegalArgumentException] { it.next() }
    assert(e.getMessage.contains("crc mismatch"))
  }

  test("maxRecordsPerFile rolls bounded shards (the TFDS layout) and " +
    "round-trips completely") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-roll").toString
    val df = (1L to 10L).map(i => (i, s"doc$i")).toDF("id", "txt")
    TfRecordIo.write(df.repartition(1), dir, maxRecordsPerFile = 3)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).map(_.getName).sorted
    assert(files.length === 4) // 3+3+3+1
    assert(files.forall(_.matches("part-\\d{5}-\\d{4}\\.tfrecord")))
    val back = TfRecordIo.read(spark, dir, df.schema)
      .orderBy("id").collect().map(_.getLong(0))
    assert(back.toSeq === (1L to 10L))
  }

  test("rolled shards compose with compression: .zst chunks round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-roll-zst").toString
    val df = (1L to 7L).map(i => (i, s"d$i")).toDF("id", "txt")
    TfRecordIo.write(df.repartition(1), dir, codec = "zstd",
      maxRecordsPerFile = 2)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord.zst"))
    assert(files.length === 4) // 2+2+2+1
    val back = TfRecordIo.read(spark, dir, df.schema)
      .orderBy("id").collect().map(_.getLong(0))
    assert(back.toSeq === (1L to 7L))
  }

  test("inferSchema: list-superset kinds from sampled records, by name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-infer").toString
    val df = Seq((1L, "a", 1.5f), (2L, "b", 2f)).toDF("id", "txt", "w")
    TfRecordIo.write(df.repartition(1), dir, codec = "gzip") // inference streams gz too
    val st = TfRecordIo.inferSchema(spark, dir)
    assert(st.fieldNames.toSeq === Seq("id", "txt", "w")) // sorted
    assert(st("id").dataType === ArrayType(LongType))
    assert(st("txt").dataType === ArrayType(BinaryType))
    assert(st("w").dataType === ArrayType(FloatType))
    assert(st.fields.forall(_.nullable))
    // a feature absent from record 1 but present later is still found
    val dir2 = java.nio.file.Files.createTempDirectory("tfrec-infer2").toString
    val df2 = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "maybe")
    TfRecordIo.write(df2.repartition(1).orderBy("id"), dir2)
    val st2 = TfRecordIo.inferSchema(spark, dir2)
    assert(st2.fieldNames.contains("maybe"))
  }

  test("inferSchema samples EVERY shard: a feature first seen in shard 2 survives") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec-shard2")
    def shard(name: String, rows: Seq[Row], st: StructType): Unit = {
      val out = new ByteArrayOutputStream()
      rows.foreach(r => TfRecordIo.frame(out, TfRecordIo.encodeExample(r, st)))
      java.nio.file.Files.write(dir.resolve(name), out.toByteArray)
    }
    shard("part-00000.tfrecord", Seq(Row(1L)),
      StructType(Seq(StructField("id", LongType))))
    shard("part-00001.tfrecord", Seq(Row(2L, "late")),
      StructType(Seq(StructField("id", LongType),
        StructField("extra", StringType))))
    val st = TfRecordIo.inferSchema(spark, dir.toString)
    assert(st.fieldNames.toSeq === Seq("extra", "id"),
      "a feature first appearing in a later shard must not vanish")
    val back = TfRecordIo.read(spark, dir.toString, st).orderBy(
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.col("id"), 1)).collect()
    assert(back(0).getAs[Seq[Array[Byte]]]("extra") === null) // absent -> null
    assert(new String(back(1).getAs[Seq[Array[Byte]]]("extra").head, "UTF-8")
      === "late")
  }

  test("a shard over the single-array read bound fails loudly, naming the file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-bound").toString
    TfRecordIo.write(Seq((1L, "a")).toDF("id", "txt").repartition(1), dir)
    // injectable bound: a real >2 GiB fixture is not buildable in-spec
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.requireShardsFit(spark, dir, Seq(".tfrecord"), bound = 4L)
    }
    assert(e.getMessage.contains("4-byte single-array read bound"))
    assert(e.getMessage.contains(".tfrecord"))
    assert(e.getMessage.contains("maxRecordsPerFile"))
    // the default bound passes small shards untouched
    TfRecordIo.requireShardsFit(spark, dir, Seq(".tfrecord"))
  }

  test("inferSchema: conflicting kinds for one feature fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec-conflict")
    val out = new ByteArrayOutputStream()
    TfRecordIo.frame(out, TfRecordIo.encodeExample(Row(5L),
      StructType(Seq(StructField("x", LongType)))))
    TfRecordIo.frame(out, TfRecordIo.encodeExample(Row(1.5f),
      StructType(Seq(StructField("x", FloatType)))))
    java.nio.file.Files.write(dir.resolve("part-00000.tfrecord"),
      out.toByteArray)
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.inferSchema(spark, dir.toString)
    }
    assert(e.getMessage.contains("two kinds"))
  }

  test("inferSchema: an always-empty list defaults to binary arrays") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-empty").toString
    val df = Seq((1L, Seq.empty[Long])).toDF("id", "e")
    TfRecordIo.write(df, dir)
    val st = TfRecordIo.inferSchema(spark, dir)
    assert(st("e").dataType === ArrayType(BinaryType))
    assert(st("id").dataType === ArrayType(LongType))
  }

  test("a mixed-codec directory (raw + .gz + .zst shards) reads as one table") {
    import spark.implicits._
    val dirs = Seq("none", "gzip", "zstd").map { c =>
      val d = java.nio.file.Files.createTempDirectory(s"tfrec-mix-$c").toString
      val df = Seq((c.length.toLong, c)).toDF("id", "txt")
      TfRecordIo.write(df.repartition(1), d, codec = c)
      d
    }
    val mixed = java.nio.file.Files.createTempDirectory("tfrec-mixed")
    dirs.zipWithIndex.foreach { case (d, i) =>
      val f = new java.io.File(d).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.copy(f.toPath,
        mixed.resolve(s"shard-$i-${f.getName.stripPrefix("part-")}"))
    }
    val st2 = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType)))
    val back = TfRecordIo.read(spark, mixed.toString, st2)
      .orderBy("id", "txt").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((4L, "gzip"), (4L, "none"), (4L, "zstd")))
  }

  test("pack-chain checksums are order-sensitive: a shuffled id sequence " +
    "with identical ids fails the position-weighted gate") {
    // the llm_tfrecord_pack_chain gate relies on pos_checksum pinning
    // concatenation ORDER, not just membership — verify the arithmetic
    // separates a permutation
    def posChk(ids: Seq[Long]): Long =
      ids.zipWithIndex.map { case (x, p) => x * p }.sum
    val ids = Seq(11L, 7L, 29L, 3L)
    val shuffled = Seq(3L, 29L, 7L, 11L)
    assert(ids.sum === shuffled.sum) // plain checksum cannot tell them apart
    assert(posChk(ids) !== posChk(shuffled))
  }

  test("a multi-megabyte gzipped shard streams through record-at-a-time") {
    // ~8 MB inflated across 2k records: exercises the streaming path on
    // a shard where a whole-file inflated copy would dominate residency.
    val payload = new Array[Byte](4096)
    java.util.Arrays.fill(payload, 'y'.toByte)
    val raw = new ByteArrayOutputStream(1 << 23)
    val st2 = StructType(Seq(StructField("b", BinaryType)))
    val rec = TfRecordIo.encodeExample(Row(payload), st2)
    (1 to 2000).foreach(_ => TfRecordIo.frame(raw, rec))
    val gz = Warc.gzip(raw.toByteArray)
    var n = 0
    val it = TfRecordIo.frameIterator(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz), 64 * 1024))
    while (it.hasNext) { assert(it.next().length === rec.length); n += 1 }
    assert(n === 2000)
  }
}
