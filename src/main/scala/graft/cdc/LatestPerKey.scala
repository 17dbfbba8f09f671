package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's merge primitive: collapse a set of change rows to exactly
  * one survivor per primary key, newest version first.
  *
  * This is the reference's only window function and its analytical core —
  * `row_number() OVER (PARTITION BY <pk> ORDER BY <mtime> DESC) = 1`
  * (`/root/reference/glue/cdc_hudi.py:144,149-159`), run per table per
  * micro-batch ("Merge the same primary key data in a batch"). Composite
  * keys come from splitting the configured key on commas
  * (`glue/cdc_hudi.py:148,157`).
  *
  * Two physical strategies with identical semantics (exactly one survivor
  * per key; ties broken arbitrarily unless a tiebreak column is given):
  *
  *  - [[rowNumber]] — literal parity: WindowExec = full shuffle on the key
  *    + per-partition sort over *all* rows. Simple, but at 100 TB every
  *    duplicate row crosses the wire.
  *  - [[maxBy]] — `max_by(struct(*), version)` as a hash aggregate:
  *    partial aggregation runs map-side, so each executor pre-collapses
  *    its duplicates and only one candidate row per (partition, key)
  *    shuffles. For skewed keys (hot rows being rewritten in a tight
  *    loop) this is the difference between a straggler and a no-op; it is
  *    the default in the streaming pipeline.
  */
object LatestPerKey {

  /** Window/row_number form (reference parity, also SQL-expressible). */
  def rowNumber(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "latest-per-key needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Convenience: order by a single version column descending (the
    * reference's `ORDER BY mtime DESC`), with optional tiebreaks. */
  def rowNumber(df: DataFrame, keys: Seq[String], versionCol: String,
                tiebreak: Seq[String] = Nil): DataFrame =
    rowNumber(df, keys, (versionCol +: tiebreak).map(c => col(c).desc))

  /** Aggregate form: one hash-aggregate with map-side combine instead of
    * shuffle+sort. `versionCols` are compared lexicographically (wrap
    * them in the order you want ties broken; later batches can pass a
    * source-rank column so "incoming beats stored on equal mtime" matches
    * Hudi's DefaultHoodieRecordPayload, `glue/cdc_hudi.py:195`). */
  def maxBy(df: DataFrame, keys: Seq[String], versionCols: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "latest-per-key needs at least one key column")
    val row = struct(df.columns.toSeq.map(col): _*)
    val version = struct(versionCols: _*)
    val winner = max_by(row, version).as("__graft_row")
    df.groupBy(keys.map(col): _*)
      .agg(winner)
      .select(col("__graft_row.*"))
      .select(df.columns.toSeq.map(col): _*) // restore original column order
  }

  def maxBy(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame =
    maxBy(df, keys, Seq(col(versionCol)))
}
