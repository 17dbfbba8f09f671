package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single most recent
  * right row at or before the left row's time, per key — the classic
  * attribution / point-in-time-lookup operator that Spark has no native
  * form of (SURVEY.md §2.5 extension; DuckDB's `ASOF JOIN` is the
  * oracle).
  *
  * Formulation: tag both sides, UNION, and fill right payloads forward
  * with `last(_, ignoreNulls)` over a (key, time, side, tiebreak)-ordered
  * running window, then keep the left rows. This is the scalable shape:
  *  - EXACTLY ONE shuffle (hash partition on the key) + one sort-based
  *    window pass, both spill-able (asserted in AsOfJoinSpec). A naive
  *    `l JOIN r ON keys AND rt <= lt` is a range join Spark can only
  *    plan as a per-key cross product — quadratic in rows per key.
  *  - Tie resolution costs nothing: right rows at the same (key, time)
  *    sort by `rightTiebreak` ascending, so the running `last()` already
  *    selects the highest tiebreak — no pre-dedup pass, no second
  *    shuffle.
  *  - State is one value per payload column: `last(ignoreNulls)` over a
  *    running frame evaluates streaming within each partition.
  *  - Left-outer semantics for free: a left row before any right row
  *    finds only nulls in its frame.
  *
  * Determinism: `rightTiebreak` must be unique per (key, time) — an id
  * column — making "the most recent right row" unique under retries and
  * engine changes. At equal timestamps the right row sorts BEFORE the
  * left row (inclusive `<=`, DuckDB ASOF semantics) unless
  * `inclusive = false` (strict `<`).
  */
object AsOfJoin {

  /** Backward as-of join. Output = every left row + each payload column
    * `p` as `asof_p` (null when no right row qualifies).
    *
    * @param leftKeys  left equi-key columns, positionally paired with
    *                  `rightKeys`
    * @param leftTime  left time column (same orderable type as
    *                  `rightTime`)
    * @param payload   right columns to carry onto left rows
    * @param rightTiebreak right column breaking (key, time) ties
    * @param inclusive true: match right rows with t <= left t (ASOF
    *                  default); false: strict <
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String], rightTiebreak: String,
               inclusive: Boolean = true): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "need positionally-paired non-empty key lists")
    require(payload.nonEmpty, "need at least one payload column")
    val keys = leftKeys.indices.map(i => s"__k$i")
    val fills = payload.indices.map(i => s"__p$i")
    val leftSide = if (inclusive) 1 else 0
    val tbType = right.schema(rightTiebreak).dataType

    val leftCols = left.columns.toSeq
    val l = left.select(
      leftKeys.zip(keys).map { case (k, a) => col(k).as(a) } ++
        Seq(col(leftTime).as("__t"), lit(leftSide).as("__side"),
          lit(null).cast(tbType).as("__tb")) ++
        leftCols.map(col) ++
        fills.zip(payload).map { case (a, p) =>
          lit(null).cast(right.schema(p).dataType).as(a)
        }: _*)
    val r = right.select(
      rightKeys.zip(keys).map { case (k, a) => col(k).as(a) } ++
        Seq(col(rightTime).as("__t"), lit(1 - leftSide).as("__side"),
          col(rightTiebreak).as("__tb")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        fills.zip(payload).map { case (a, p) => col(p).as(a) }: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(
        (leftCols.map(col) :+ (col("__side") === leftSide).as("__is_left")) ++
          fills.zip(payload).map { case (a, p) =>
            last(col(a), ignoreNulls = true).over(w).as(s"asof_$p")
          }: _*)
      .where(col("__is_left")).drop("__is_left")
  }
}
