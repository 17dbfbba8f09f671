package graft.ext

import graft.SparkSpecBase

class CompressStatsSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("boilerplate repetition compresses far better than noise") {
    val rep = "the same line of boilerplate over and over " * 40
    val junk = new scala.util.Random(42).alphanumeric.take(400).mkString
    val out = CompressStats.deflateStats(
        df(1L -> rep, 2L -> junk), "doc_id", "text")
      .orderBy("doc_id").collect()
    val (repRatio, junkRatio) = (out(0).getDouble(3), out(1).getDouble(3))
    assert(repRatio < 0.1, s"repetition ratio $repRatio")
    assert(junkRatio > 0.5, s"noise ratio $junkRatio")
  }

  test("pure per-row function: identical under repartitioning") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = CompressStats.deflateStats(real, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = CompressStats.deflateStats(real.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("empty text gets zero lengths and ratio") {
    val out = CompressStats.deflateStats(df(1L -> ""), "doc_id", "text")
      .collect().head
    assert(out.getLong(1) === 0L && out.getLong(2) === 0L &&
      out.getDouble(3) === 0.0)
  }

  test("raw_len counts UTF-8 bytes, not chars") {
    val out = CompressStats.deflateStats(df(1L -> "中文"),
      "doc_id", "text").collect().head
    assert(out.getLong(1) === 6L) // 2 CJK chars x 3 bytes
  }

  test("the kernel is map-side: no shuffle in the plan") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = CompressStats.deflateStats(real, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
