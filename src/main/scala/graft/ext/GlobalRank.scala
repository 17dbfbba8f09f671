package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank WITHOUT a single-partition window — the
  * distributed-rank building block behind rank-bucketed selection
  * (CCNet's head/middle/tail perplexity split, percentile audits).
  *
  * A bare `row_number() OVER (ORDER BY …)` plans every row through ONE
  * window partition — the classic scale-killer. Here the rank is
  * assembled the textbook distributed way, in one lazy plan:
  *
  *  1. range-repartition on the order key (Spark's sampled range
  *     exchange — each output partition holds a contiguous key slice);
  *  2. per-partition row counts → prefix-sum offsets. This window IS
  *     single-partition, but over `shuffle.partitions` ROWS (one per
  *     slice), not over the data — bounded and disclosed;
  *  3. rank = slice offset + within-slice `row_number()` (a window
  *     PARTITIONED by slice, so per-slice sorts spill independently).
  *
  * The order must be TOTAL (pass a tie-breaking key column last):
  * ranks are then unique and independent of where the sampled slice
  * boundaries land, so retries/replans cannot change the result. The
  * two consumers of the range exchange dedup via ReusedExchange, and
  * Spark's range sampling is seed-deterministic besides.
  */
object GlobalRank {

  /** `df` plus `rankCol` (0-based exact global rank under `ord`) and
    * `totalCol` (the total row count, riding every row for bucket
    * arithmetic — avoids a second scalar join downstream). */
  def withRank(df: DataFrame, ord: Seq[Column], rankCol: String = "rank",
               totalCol: String = "total"): DataFrame = {
    require(ord.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df.repartitionByRange(nParts, ord: _*)
      .withColumn("__rk_part", spark_partition_id())
    val counts = parted.groupBy("__rk_part").agg(count(lit(1)).as("__rk_c"))
    // prefix-sum over ONE ROW PER SLICE (bounded by shuffle.partitions)
    val byPart = Window.orderBy("__rk_part")
    val offs = counts
      .withColumn("__rk_off", coalesce(
        sum("__rk_c").over(byPart.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn(totalCol, sum("__rk_c").over(
        byPart.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("__rk_c")
    val within = Window.partitionBy("__rk_part").orderBy(ord: _*)
    parted.join(broadcast(offs), Seq("__rk_part"))
      .withColumn(rankCol,
        col("__rk_off") + row_number().over(within).cast("long") - 1)
      .drop("__rk_part", "__rk_off")
  }
}
