package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream attribution join: each left event pairs with the right
  * events of the same key whose time falls within
  * `[leftTime - lookback, leftTime]` — the streaming form of the batch
  * as-of/interval family (`ext/AsOfJoin`, `ext/IntervalJoin`), SURVEY.md
  * §2.9 extension.
  *
  * Scale contract: BOTH sides carry watermarks and the join condition
  * bounds `rightTime` relative to `leftTime` in both directions, which
  * is exactly what Spark's streaming join planner needs to derive state
  * eviction — each side buffers at most (watermark delay + lookback) of
  * history instead of growing forever (asserted in the spec by feeding
  * a row far older than the watermark and observing no late output).
  * Inner-join rows emit as soon as both sides have arrived; no
  * watermark-wait applies to output, only to state cleanup.
  */
object StreamIntervalJoin {

  /** Column names of `left` and `right` must be disjoint (streaming
    * joins have no alias disambiguation across restarts). `lookback` is
    * an interval Column, e.g. `expr("INTERVAL 10 SECONDS")`.
    *
    * `joinType` "inner" (default) emits matches as they arrive;
    * "left_outer" ALSO emits each unmatched left row null-padded — but
    * only once the watermark proves no in-window right row can still
    * arrive (Spark holds the left row in state until its window is
    * closed; asserted in the spec). That is the streaming form of the
    * batch as-of join's left-outer contract. */
  def backwardWithin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     delayThreshold: String, lookback: Column,
                     joinType: String = "inner"): DataFrame = {
    require((left.columns.toSet & right.columns.toSet).isEmpty,
      "stream-stream join requires disjoint column names")
    require(Seq("inner", "left_outer").contains(joinType),
      s"unsupported joinType $joinType")
    val l = left.withWatermark(leftTime, delayThreshold)
    val r = right.withWatermark(rightTime, delayThreshold)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - lookback &&
        col(rightTime) <= col(leftTime),
      joinType)
  }
}
