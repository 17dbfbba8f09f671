package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.Files

class AvroIoSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  private def fixture() = {
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null),
      Row(3L, "gamma é世", -0.25, false, Array[Byte]()))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("round trip: values, nulls, unicode strings, and binary survive byte-exact") {
    val dir = Files.createTempDirectory("graft-avro-spec").toString
    val d = fixture()
    AvroIo.write(d, dir)
    val back = AvroIo.read(spark, dir, schema).collect().sortBy(_.getLong(0))
    assert(back.length === 3)
    assert(back(0).getString(1) === "alpha" &&
      back(0).getAs[Array[Byte]](4).toSeq === Seq[Byte](1, 2, 3))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) &&
      back(1).isNullAt(3) && back(1).isNullAt(4))
    assert(back(2).getString(1) === "gamma é世" &&
      back(2).getDouble(2) === -0.25 &&
      back(2).getAs[Array[Byte]](4).isEmpty)
  }

  test("one container file per non-empty partition") {
    val dir = Files.createTempDirectory("graft-avro-parts").toString
    AvroIo.write(fixture().repartition(5), dir)
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".avro"))
    // 3 rows over 5 partitions: at most 3 non-empty, at least 1
    assert(parts.nonEmpty && parts.length <= 3)
    val back = AvroIo.read(spark, dir, schema)
    assert(back.count() === 3)
  }

  test("re-write with fewer partitions clears stale parts; empty write leaves a readable dir") {
    val dir = Files.createTempDirectory("graft-avro-over").toString
    AvroIo.write(fixture().repartition(3), dir)
    // narrower re-write of a 1-row subset: stale part files must vanish
    val one = fixture().where(org.apache.spark.sql.functions.col("id") === 1L)
    AvroIo.write(one.repartition(1), dir)
    assert(AvroIo.read(spark, dir, schema).count() === 1)
    // all-empty write: no parts, but the dir reads as empty, not an error
    AvroIo.write(fixture().where(org.apache.spark.sql.functions.lit(false)), dir)
    assert(AvroIo.read(spark, dir, schema).count() === 0)
    // no tmp litter from the commit protocol
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.contains(".tmp"))
    assert(leftovers.isEmpty, s"uncommitted tmp files: ${leftovers.toSeq}")
  }

  test("reader tolerates writer-side field reorder, fails fast on missing field") {
    val dir = Files.createTempDirectory("graft-avro-names").toString
    AvroIo.write(fixture(), dir)
    // reordered read schema: lookup is by name
    val reordered = StructType(schema.fields.reverse)
    val got = AvroIo.read(spark, dir, reordered)
      .collect().sortBy(_.getAs[Long]("id"))
    assert(got.head.getAs[String]("name") === "alpha")
    // a field the writer never produced must fail, not null-fill
    val bad = schema.add(StructField("ghost", LongType, nullable = true))
    val ex = intercept[org.apache.spark.SparkException] {
      AvroIo.read(spark, dir, bad).collect()
    }
    assert(ex.getMessage.contains("ghost") ||
      Option(ex.getCause).exists(_.getMessage.contains("ghost")))
  }

  test("unsupported nested type is rejected at schema build time") {
    val nested = StructType(Seq(StructField("m",
      MapType(StringType, LongType), nullable = true)))
    intercept[IllegalArgumentException] { AvroIo.avroSchema(nested) }
  }

  test("a container over the single-array read bound fails loudly, naming the file") {
    val dir = Files.createTempDirectory("graft-avro-bound").toString
    AvroIo.write(fixture(), dir)
    // injectable bound (a real >2 GiB fixture is not buildable in-spec);
    // the avro label must land in the message, not the tfrecord default
    val e = intercept[IllegalArgumentException] {
      TfRecordIo.requireShardsFit(spark, dir, Seq(".avro"), bound = 4L,
        label = "avro")
    }
    assert(e.getMessage.contains("avro: shard"))
    assert(e.getMessage.contains(".avro"))
    // read() passes small containers untouched through the default bound
    assert(AvroIo.read(spark, dir, schema).count() === 3)
  }
}
