package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {

  private def docs(n: Long) =
    spark.range(n).select(col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("grp"))

  test("stratifiedK: exactly k rows per group (or the whole group when smaller)") {
    val got = Sampling.stratifiedK(docs(200), "doc_id", "grp", k = 10)
      .groupBy("grp").agg(count(lit(1)).as("n"),
        max("sample_rank").as("maxr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 3)
    assert(got.forall(t => t._2 === 10L && t._3 === 10L))
    // a group smaller than k survives whole
    val tiny = Sampling.stratifiedK(docs(5), "doc_id", "grp", k = 10)
    assert(tiny.count() === 5)
  }

  test("two-phase salted form equals the plain single-window top-k") {
    val d = docs(500).repartition(13) // salts see varied partition ids
    val twoPhase = Sampling.stratifiedK(d, "doc_id", "grp", k = 7, salts = 4)
      .select("grp", "doc_id", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("grp"))
      .orderBy(Sampling.bucket(col("doc_id")).asc, col("doc_id").asc)
    val plain = d.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= 7)
      .select("grp", "doc_id", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twoPhase === plain)
  }

  test("duplicate keys with tieCols equal the plain window; total order restored") {
    // 4 copies of every key: (bucket, key) alone is no longer a total
    // order — tieCols supplies the uid tiebreaker both windows share
    val d = docs(120).crossJoin(spark.range(4).select(col("id").as("copy")))
      .withColumn("uid", col("doc_id") * 4 + col("copy"))
    val twoPhase = Sampling.stratifiedK(d, "doc_id", "grp", k = 9,
        salts = 4, tieCols = Seq("uid"))
      .select("grp", "uid", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("grp"))
      .orderBy(Sampling.bucket(col("doc_id")).asc, col("doc_id").asc,
        col("uid").asc)
    val plain = d.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= 9)
      .select("grp", "uid", "sample_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twoPhase === plain)
  }

  test("stratifiedK is deterministic across partitionings") {
    def run(parts: Int) =
      Sampling.stratifiedK(docs(300).repartition(parts), "doc_id", "grp",
          k = 5)
        .select("grp", "doc_id", "sample_rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3))
    assert(run(2).toSeq === run(11).toSeq)
  }
}
