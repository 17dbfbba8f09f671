package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IncrementalDistinctSpec extends SparkSpecBase {

  private def events(ids: Range, types: Int = 3): DataFrame =
    spark.range(ids.start, ids.end).select(
      col("id").as("event_id"),
      (col("id") % 97).as("user_id"),
      concat(lit("t"), (col("id") % types).cast("string")).as("event_type"))

  private def ests(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getAs[String]("event_type") ->
      r.getAs[Long]("distinct_est")).toMap

  test("estimate over store ∪ batch equals a single-pass sketch (merge is lossless)") {
    val dir = Files.createTempDirectory("graft-hll").toString
    val old = events(0 until 5000)
    val batch = events(5000 until 6000)
    IncrementalDistinct.writeIndex(old, "event_type", "user_id", dir, lgK = 12)
    val inc = ests(IncrementalDistinct.estimate(spark, dir, batch,
      "event_type", "user_id"))
    val full = events(0 until 6000).groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("distinct_est"))
    assert(inc === ests(full))
  }

  test("estimates sit within the HLL envelope of the exact counts") {
    val dir = Files.createTempDirectory("graft-hll2").toString
    IncrementalDistinct.writeIndex(events(0 until 8000), "event_type",
      "user_id", dir, lgK = 12)
    val inc = ests(IncrementalDistinct.estimate(spark, dir,
      events(8000 until 9000), "event_type", "user_id"))
    val exact = events(0 until 9000).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, d) =>
      assert(math.abs(inc(t) - d) <= math.max(2L, (d * 0.05).toLong),
        s"type $t: est ${inc(t)} vs exact $d")
    }
  }

  test("appendToIndex accumulates epochs; compact folds them without changing estimates") {
    val dir = Files.createTempDirectory("graft-hll3").toString
    IncrementalDistinct.writeIndex(events(0 until 3000), "event_type",
      "user_id", dir)
    IncrementalDistinct.appendToIndex(events(3000 until 4000), "event_type",
      "user_id", dir, "day1")
    IncrementalDistinct.appendToIndex(events(4000 until 5000), "event_type",
      "user_id", dir, "day2")
    val before = ests(IncrementalDistinct.estimate(spark, dir,
      events(5000 until 5100), "event_type", "user_id"))
    IncrementalDistinct.compact(spark, dir)
    val after = ests(IncrementalDistinct.estimate(spark, dir,
      events(5000 until 5100), "event_type", "user_id"))
    assert(before === after)
    val epochs = spark.read.parquet(s"$dir/sketches")
      .select("__epoch").distinct().collect().map(_.getString(0)).toSeq
    assert(epochs === Seq("base"))
  }

  test("replayed epoch is idempotent (overwrites its own partition)") {
    val dir = Files.createTempDirectory("graft-hll4").toString
    IncrementalDistinct.writeIndex(events(0 until 2000), "event_type",
      "user_id", dir)
    val day = events(2000 until 2500)
    IncrementalDistinct.appendToIndex(day, "event_type", "user_id", dir, "d1")
    val once = ests(IncrementalDistinct.estimate(spark, dir,
      events(2500 until 2600), "event_type", "user_id"))
    IncrementalDistinct.appendToIndex(day, "event_type", "user_id", dir, "d1")
    val twice = ests(IncrementalDistinct.estimate(spark, dir,
      events(2500 until 2600), "event_type", "user_id"))
    assert(once === twice)
  }
}
