package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single nearest right
  * row at or before (backward) / at or after (forward) the left row's
  * time, per key — the classic attribution / point-in-time-lookup
  * operator that Spark has no native form of (SURVEY.md §2.5 extension;
  * DuckDB's `ASOF JOIN` is the oracle).
  *
  * Formulation: tag both sides, UNION, and fill right payloads forward
  * with `last(_, ignoreNulls)` over a (key, time, side, tiebreak)-ordered
  * running window, then keep the left rows. This is the scalable shape:
  *  - EXACTLY ONE shuffle (hash partition on the key) + one sort-based
  *    window pass, both spill-able (asserted in AsOfJoinSpec). A naive
  *    `l JOIN r ON keys AND rt <= lt` is a range join Spark can only
  *    plan as a per-key cross product — quadratic in rows per key.
  *  - Tie resolution costs nothing: right rows at the same (key, time)
  *    sort so that the running `last()` already selects the winning
  *    tiebreak — no pre-dedup pass, no second shuffle.
  *  - State is one value per payload column: `last(ignoreNulls)` over a
  *    running frame evaluates streaming within each partition.
  *  - Left-outer semantics for free: a left row before any right row
  *    finds only nulls in its frame.
  *  - `forward` is the same plan with the time sort reversed;
  *    `tolerance` is a post-window mask on the matched time — neither
  *    adds a shuffle.
  *
  * Determinism: `rightTiebreak` must be unique per (key, time) — an id
  * column. Backward resolves (key, time) ties to the HIGHEST tiebreak
  * ("latest wins", matching the merge discipline elsewhere in the
  * engine); forward to the LOWEST ("earliest wins") — each is the
  * natural continuation of its time direction. At equal timestamps the
  * right row matches (inclusive, DuckDB ASOF semantics) unless
  * `inclusive = false`.
  *
  * Payload columns are carried TOGETHER from the single matched right
  * row (the fills share one window); a payload column that is null IN
  * the right data would fall back to an older row's value independently
  * — pass non-null payload columns.
  */
object AsOfJoin {

  /** Backward as-of join: nearest right row with t <= left t (strict <
    * when `inclusive = false`). Output = every left row + each payload
    * column `p` as `asof_p` (null when no right row qualifies).
    *
    * @param leftKeys  left equi-key columns, positionally paired with
    *                  `rightKeys`
    * @param leftTime  left time column (same orderable type as
    *                  `rightTime`)
    * @param payload   right columns to carry onto left rows
    * @param rightTiebreak right column breaking (key, time) ties
    * @param tolerance optional max distance between left time and the
    *                  matched right time: a Column comparable against
    *                  `leftTime - rightTime` (an INTERVAL literal for
    *                  timestamp columns, a number for numeric times);
    *                  matches farther away become nulls
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String], rightTiebreak: String,
               inclusive: Boolean = true,
               tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, leftKeys, rightKeys, leftTime, rightTime,
      payload, rightTiebreak, inclusive, forward = false, tolerance)

  /** Forward as-of join: nearest right row with t >= left t (strict >
    * when `inclusive = false`); ties resolve to the lowest tiebreak.
    * Same output contract and plan shape as [[backward]]. */
  def forward(left: DataFrame, right: DataFrame,
              leftKeys: Seq[String], rightKeys: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[String], rightTiebreak: String,
              inclusive: Boolean = true,
              tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, leftKeys, rightKeys, leftTime, rightTime,
      payload, rightTiebreak, inclusive, forward = true, tolerance)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       leftKeys: Seq[String], rightKeys: Seq[String],
                       leftTime: String, rightTime: String,
                       payload: Seq[String], rightTiebreak: String,
                       inclusive: Boolean, forward: Boolean,
                       tolerance: Option[Column]): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "need positionally-paired non-empty key lists")
    require(payload.nonEmpty, "need at least one payload column")
    val keys = leftKeys.indices.map(i => s"__k$i")
    val fills = payload.indices.map(i => s"__p$i")
    // reject inputs whose columns collide with the synthesized working
    // columns or the asof_* outputs — an ambiguous name would otherwise
    // bind arbitrarily inside the window sort (same guard discipline as
    // IntervalJoin)
    val internal = (keys ++ fills ++ Seq("__t", "__side", "__tb", "__rt",
      "__is_left")).toSet ++ payload.map(p => s"asof_$p")
    val clash = (left.columns.toSet ++ right.columns.toSet) & internal
    require(clash.isEmpty, s"column name collision with as-of internals: $clash")
    val leftSide = if (inclusive) 1 else 0
    val tbType = right.schema(rightTiebreak).dataType
    val rtType = right.schema(rightTime).dataType

    val leftCols = left.columns.toSeq
    val l = left.select(
      leftKeys.zip(keys).map { case (k, a) => col(k).as(a) } ++
        Seq(col(leftTime).as("__t"), lit(leftSide).as("__side"),
          lit(null).cast(tbType).as("__tb"),
          lit(null).cast(rtType).as("__rt")) ++
        leftCols.map(col) ++
        fills.zip(payload).map { case (a, p) =>
          lit(null).cast(right.schema(p).dataType).as(a)
        }: _*)
    // SQL join semantics: a null key or null time never matches. The
    // window formulation would otherwise GROUP null keys together
    // (partitionBy treats null as a value) and SORT null times to an end
    // of the partition (feeding fills no inequality admits) — so right
    // rows with a null key or time are dropped (they can match nothing);
    // null-key left rows then sit in right-free partitions, and
    // null-TIME left rows are masked to null payloads below.
    val r = right
      .where((rightKeys :+ rightTime).map(col(_).isNotNull).reduce(_ && _))
      .select(
      rightKeys.zip(keys).map { case (k, a) => col(k).as(a) } ++
        Seq(col(rightTime).as("__t"), lit(1 - leftSide).as("__side"),
          col(rightTiebreak).as("__tb"), col(rightTime).as("__rt")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        fills.zip(payload).map { case (a, p) => col(p).as(a) }: _*)

    // Scan order: time ascending for backward, descending for forward —
    // the running last() then always holds "the nearest qualifying right
    // row so far". Side orders right rows into a left row's frame only
    // when the bound admits them; tiebreak order makes last() pick the
    // winner (backward: asc scan → highest; forward: desc scan → lowest).
    val dir: Column => Column = if (forward) _.desc else _.asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(dir(col("__t")), col("__side").asc, dir(col("__tb")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedT = last(col("__rt"), ignoreNulls = true).over(w)
    val baseGate = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        val dist = if (forward) matchedT - col("__t") else col("__t") - matchedT
        dist <= tol
    }
    // null-time left rows match nothing (no inequality is true of null)
    val withinTolerance = col("__t").isNotNull && baseGate
    l.unionByName(r)
      .select(
        (leftCols.map(col) :+ (col("__side") === leftSide).as("__is_left")) ++
          fills.zip(payload).map { case (a, p) =>
            when(withinTolerance, last(col(a), ignoreNulls = true).over(w))
              .as(s"asof_$p")
          }: _*)
      .where(col("__is_left")).drop("__is_left")
  }
}
