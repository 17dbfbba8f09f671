package graft.cdc

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame

/** P2-P8 normalization: envelope parse, delete-image coalesce, op filter,
  * soft-delete flag, mtime extraction; plus schema-merge rules. */
class CdcNormalizeSpec extends SparkSpecBase {

  private val user = SyncTable("test_db", "user", "id")

  private def raw(rows: String*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("value")
  }

  test("debezium: delete events take the before image; flag and mtime set") {
    val rows = raw(
      """{"before":null,"after":{"id":1,"name":"ann"},"source":{"db":"test_db","table":"user"},"op":"c","ts_ms":100}""",
      """{"before":{"id":1,"name":"ann"},"after":null,"source":{"db":"test_db","table":"user"},"op":"d","ts_ms":200}""")
    val out = CdcNormalize.normalize(spark, rows, CdcFormat.MskDebeziumCdc, user)
      .get.orderBy(CdcNormalize.MtimeCol).collect()
    assert(out.length === 2)
    assert(out(1).getAs[String]("name") === "ann") // before image surfaced
    assert(out(1).getAs[Boolean](CdcNormalize.DeletedCol))
    assert(!out(0).getAs[Boolean](CdcNormalize.DeletedCol))
    assert(out(0).getAs[Long](CdcNormalize.MtimeCol) === 100L)
  }

  test("debezium: unknown ops are filtered out") {
    val rows = raw(
      """{"after":{"id":1},"source":{"db":"test_db","table":"user"},"op":"c","ts_ms":1}""",
      """{"after":{"id":2},"source":{"db":"test_db","table":"user"},"op":"x","ts_ms":2}""")
    assert(CdcNormalize.normalize(spark, rows, CdcFormat.MskDebeziumCdc, user).get.count() === 1)
  }

  test("DMS: record-type/operation filters and string mtime") {
    val rows = raw(
      """{"data":{"id":1},"metadata":{"timestamp":"2024-01-01 00:00:00.000001","record-type":"data","operation":"insert","schema-name":"test_db","table-name":"user"}}""",
      """{"data":{"id":2},"metadata":{"timestamp":"2024-01-01 00:00:00.000002","record-type":"data","operation":"delete","schema-name":"test_db","table-name":"user"}}""",
      """{"data":{"id":3},"metadata":{"timestamp":"t","record-type":"data","operation":"weird-op","schema-name":"test_db","table-name":"user"}}""")
    val out = CdcNormalize.normalize(spark, rows, CdcFormat.DmsCdc, user)
      .get.orderBy("id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String](CdcNormalize.MtimeCol) === "2024-01-01 00:00:00.000001")
    assert(out(1).getAs[Boolean](CdcNormalize.DeletedCol)) // delete op
  }

  test("debezium: router false-positive without op/ts_ms envelope → None, not AnalysisException") {
    // A substring-routed non-CDC record can carry an after-shaped object
    // with no envelope fields; the normalize must degrade like the
    // missing-images case (the DMS twin's metadata guard) instead of
    // throwing on kdata.op — which would fail the batch on every replay.
    val rows = raw(
      """{"after":{"id":1,"note":"mentions \"db\":\"test_db\" and \"table\":\"user\""},"source":{"db":"test_db","table":"user"}}""")
    assert(CdcNormalize.normalize(spark, rows, CdcFormat.MskDebeziumCdc, user).isEmpty)
  }

  test("no routed rows → None (reference skips the table)") {
    val rows = raw("""{"after":{"id":1},"source":{"db":"other","table":"other"},"op":"c","ts_ms":1}""")
    assert(CdcNormalize.normalize(spark, rows, CdcFormat.MskDebeziumCdc, user).isEmpty)
  }

  test("schema merge: widening and null adoption") {
    import org.apache.spark.sql.types._
    val a = StructType(Seq(StructField("x", LongType), StructField("y", NullType)))
    val b = StructType(Seq(StructField("x", DoubleType), StructField("y", StringType),
      StructField("z", LongType)))
    val m = SchemaInference.mergeStructs(a, b)
    assert(m("x").dataType === DoubleType)
    assert(m("y").dataType === StringType)
    assert(m("z").dataType === LongType)
  }

  test("cached mode re-infers when a record no longer parses against the cached schema") {
    val s = spark; import s.implicits._
    SchemaInference.clearAll()
    val key = s"${CdcFormat.MskDebeziumCdc.name}:test_db.user" // format-qualified cache key
    // seed the cache from an envelope whose after.id is a long
    SchemaInference.forTable(spark, key,
      Seq("""{"after":{"id":123},"op":"c","ts_ms":1}""").toDS(),
      SchemaInference.Mode.Cached)
    // an evolved upstream now sends id as a string → coercion failure →
    // corrupt-record probe fires → schema refreshed as old ∪ new
    val rows = raw(
      """{"before":null,"after":{"id":"abc"},"source":{"db":"test_db","table":"user"},"op":"c","ts_ms":5}""")
    val out = CdcNormalize.normalize(spark, rows, CdcFormat.MskDebeziumCdc, user,
      SchemaInference.Mode.Cached).get
    assert(out.count() === 1)
    assert(out.schema("id").dataType ===
      org.apache.spark.sql.types.StringType) // long ∪ string widens to string
    assert(out.head().getAs[String]("id") === "abc")
    SchemaInference.clearAll()
  }
}
