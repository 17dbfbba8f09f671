package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact rank: equals the single-window row_number() under
  * any input partitioning, and never plans a data-wide single-partition
  * window. */
class GlobalRankSpec extends SparkSpecBase {

  // duplicate scores force the tie-break path; ids scrambled so input
  // order disagrees with rank order
  private def fixture(n: Long) = {
    val s = spark; import s.implicits._
    spark.range(n).select(
      (col("id") * 37 % n).as("doc_id"),
      (col("id") % 7).cast("double").as("score"))
  }

  test("rank equals the single-window row_number under a total order") {
    val df = fixture(500L)
    val got = GlobalRank.withRank(df,
        Seq(col("score").asc, col("doc_id").asc), "rk", "n")
      .select("doc_id", "rk", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.orderBy(col("score").asc, col("doc_id").asc)
    val want = df.withColumn("rk", row_number().over(w).cast("long") - 1)
      .withColumn("n", lit(500L))
      .select("doc_id", "rk", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("ranks are a complete 0..n-1 permutation, stable across partitionings") {
    val df = fixture(300L)
    def ranks(parts: Int): Map[Long, Long] =
      GlobalRank.withRank(df.repartition(parts),
          Seq(col("score").asc, col("doc_id").asc), "rk")
        .select("doc_id", "rk")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val a = ranks(2)
    val b = ranks(23)
    assert(a === b)
    assert(a.values.toSeq.sorted === (0L until 300L))
  }

  test("no data-wide single-partition window in the plan") {
    // the only permitted SinglePartition is the prefix-sum over ONE ROW
    // PER RANGE SLICE (bounded by shuffle.partitions) — the data rows
    // must flow through range + per-slice windows only. Assert by shape:
    // every window over the raw input columns carries a partition spec.
    val p = GlobalRank.withRank(fixture(100L),
        Seq(col("score").asc, col("doc_id").asc), "rk")
      .queryExecution.executedPlan.toString
    // the data-side window is partitioned by the slice id
    assert(p.contains("__rk_part"), s"expected slice-partitioned window:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in rank plan:\n$p")
  }
}
