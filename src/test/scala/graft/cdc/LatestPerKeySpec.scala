package graft.cdc

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** W1: exactly one survivor per key, newest version first; the two
  * physical forms (WindowExec rowNumber vs max_by hash aggregate) must be
  * observably identical. */
class LatestPerKeySpec extends SparkSpecBase {

  private def fixture = {
    val s = spark; import s.implicits._
    Seq(
      ("a", 1L, 100L), ("a", 2L, 300L), ("a", 3L, 200L),
      ("b", 4L, 100L),
      ("c", 5L, 100L), ("c", 6L, 100L) // tie on ts → tiebreak on id desc
    ).toDF("k", "id", "ts")
  }

  test("rowNumber keeps exactly the newest row per key") {
    val out = LatestPerKey.rowNumber(fixture, Seq("k"), "ts", tiebreak = Seq("id"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 2L), ("b", 4L), ("c", 6L)))
  }

  test("maxBy agrees with rowNumber, including on version ties") {
    val rn = LatestPerKey.rowNumber(fixture, Seq("k"), "ts", tiebreak = Seq("id"))
    val mb = LatestPerKey.maxBy(fixture, Seq("k"), Seq(col("ts"), col("id")))
    assert(rn.exceptAll(mb).isEmpty && mb.exceptAll(rn).isEmpty)
  }

  test("composite keys partition correctly") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("d1", "t1", 1L, 10L), ("d1", "t1", 2L, 20L),
      ("d1", "t2", 3L, 10L), ("d2", "t1", 4L, 10L)
    ).toDF("db", "tbl", "id", "ts")
    val out = LatestPerKey.maxBy(df, Seq("db", "tbl"), Seq(col("ts")))
    assert(out.count() === 3)
    assert(out.where(col("db") === "d1" && col("tbl") === "t1")
      .head().getAs[Long]("id") === 2L)
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = LatestPerKey.maxBy(fixture, Seq("k"), Seq(col("ts"), col("id")))
    val twice = LatestPerKey.maxBy(once, Seq("k"), Seq(col("ts"), col("id")))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
