package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong
  * to one session while the gap between them stays under `gapMs`; a
  * larger gap starts a new session. The batch-analytics sibling of
  * streaming session windows (the reference has neither; SURVEY.md §2.9
  * notes no event-time state — this extends the analytics surface the
  * same way the window rollup does).
  *
  * Plan shape: ONE shuffle on the key columns; both window passes (the
  * `lag` gap flag and the running `sum` that turns flags into session
  * ordinals) and the final per-session aggregate all share that
  * partitioning, so Catalyst plans a single Exchange with two WindowExecs
  * + partial-agg on top. Per-key work is a sort — sessionization is
  * inherently per-key sequential; a pathologically hot key is a sort
  * straggler, not a shuffle explosion.
  */
object Sessionize {

  /** Attach `session_id` (1-based per key, in (ts, tiebreak) order). */
  def withSessionIds(df: DataFrame, keys: Seq[String], tsMs: Column,
                     gapMs: Long, tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsMs.asc +: tiebreak.map(_.asc): _*)
    val prev = lag(tsMs, 1).over(w)
    val isNew = when(prev.isNull || (tsMs - prev) > gapMs, 1L).otherwise(0L)
    df.withColumn("__session_new", isNew)
      .withColumn("session_id", sum(col("__session_new")).over(w))
      .drop("__session_new")
  }

  /** Per-session rollup: event count + span (epoch millis, integer-exact
    * for oracle comparison). */
  def sessions(df: DataFrame, keys: Seq[String], tsMs: Column, gapMs: Long,
               tiebreak: Seq[Column] = Nil): DataFrame =
    withSessionIds(df.withColumn("__ts_ms", tsMs), keys, col("__ts_ms"),
        gapMs, tiebreak)
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts_ms")).as("start_ms"),
        max(col("__ts_ms")).as("end_ms"))
}
