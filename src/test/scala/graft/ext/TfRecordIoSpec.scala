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

  test("gzipped files round-trip; magic is sniffed on read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfrec-gz").toString
    val df = Seq((1L, "a"), (2L, "bb")).toDF("id", "txt")
    TfRecordIo.write(df.repartition(1), dir, gzipped = true)
    // the on-disk file really is gzip (magic bytes)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val head = java.nio.file.Files.readAllBytes(f.toPath).take(2)
    assert((head(0) & 0xff) === 0x1f && (head(1) & 0xff) === 0x8b)
    val back = TfRecordIo.read(spark, dir, df.schema)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((1L, "a"), (2L, "bb")))
  }
}
