package graft.cdc

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** P1 router truth table across the three dialects
  * (ref `glue/cdc_hudi.py:115-140` semantics). */
class CdcRouterSpec extends SparkSpecBase {

  private def df(rows: String*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("value")
  }
  private def routed(d: DataFrame, f: CdcFormat, t: SyncTable): Long =
    d.where(CdcRouter.substringMatch(col("value"), f, t)).count()

  val user = SyncTable("test_db", "user", "id")
  val product = SyncTable("test_db", "product", "id")

  val dbzUser =
    """{"before":null,"after":{"id":1,"name":"x"},"source":{"db":"test_db","table":"user"},"op":"c","ts_ms":100}"""
  val dbzProduct =
    """{"before":null,"after":{"id":2},"source":{"db":"test_db","table":"product"},"op":"c","ts_ms":101}"""
  val dbzOtherDb =
    """{"after":{"id":3},"source":{"db":"other_db","table":"user"},"op":"c","ts_ms":102}"""

  test("debezium/flink routing matches db+table, rejects others") {
    val d = df(dbzUser, dbzProduct, dbzOtherDb)
    for (f <- Seq(CdcFormat.FlinkCdc, CdcFormat.MskDebeziumCdc)) {
      assert(routed(d, f, user) === 1)
      assert(routed(d, f, product) === 1)
    }
  }

  test("DMS routing matches schema-name/table-name and rejects control records") {
    val dmsData =
      """{"data":{"id":1},"metadata":{"timestamp":"2024-01-01 00:00:00.000000","record-type":"data","operation":"insert","schema-name":"test_db","table-name":"user"}}"""
    val dmsControl =
      """{"metadata":{"timestamp":"t","record-type":"control","operation":"create-table","schema-name":"test_db","table-name":"user"}}"""
    val d = df(dmsData, dmsControl)
    assert(routed(d, CdcFormat.DmsCdc, user) === 1)
  }

  test("substring parity quirk: a payload FIELD named table matches") {
    // The reference regex-matches the raw string, so a row of another
    // table whose payload carries its own "table":"user" field is a
    // (documented) false positive — parity mode must reproduce it.
    val sneaky =
      """{"after":{"id":9,"table":"user"},"source":{"db":"test_db","table":"product"},"op":"c","ts_ms":1}"""
    assert(routed(df(sneaky), CdcFormat.FlinkCdc, user) === 1)
    assert(routed(df(sneaky), CdcFormat.FlinkCdc, product) === 1)
  }

  test("configured names may be regexes (README.md:38 capability)") {
    val either = SyncTable("test_db", "(user|product)", "id")
    assert(routed(df(dbzUser, dbzProduct, dbzOtherDb), CdcFormat.FlinkCdc, either) === 2)
  }

  test("strict mode routes on parsed envelope fields only") {
    val schema = StructType(Seq(
      StructField("after", StructType(Seq(
        StructField("id", StringType), StructField("table", StringType)))),
      StructField("source", StructType(Seq(
        StructField("db", StringType), StructField("table", StringType))))))
    val sneaky =
      """{"after":{"id":"9","table":"user"},"source":{"db":"test_db","table":"product"}}"""
    val parsed = df(sneaky, dbzUser)
      .select(from_json(col("value"), schema).as("kdata"))
    val strictUser = parsed
      .where(CdcRouter.strictMatch(col("kdata"), CdcFormat.FlinkCdc, user))
    assert(strictUser.count() === 1) // only the real user row; no false positive
  }
}
