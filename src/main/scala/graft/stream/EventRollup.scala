package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming event-time rollup: tumbling-window counts with a watermark
  * (SURVEY.md §2.9 notes the reference needs none — its upsert is
  * idempotent latest-wins — but the windowed-agg + watermark shape is
  * the standard capability a user of this engine expects for metrics
  * over the same event stream; the batch twin is
  * `RelationalQueries.eventsHourly`).
  *
  * Scale: state is bounded by the watermark — windows older than
  * (max event time − delay) are finalized, emitted (append mode) and
  * evicted; later-than-watermark events are dropped, never buffered. */
object EventRollup {

  /** Windowed counts per key over a streaming DataFrame bearing an
    * event-time column `ts`. Append-mode compatible (emits each window
    * once, after the watermark passes its end). */
  def windowed(events: DataFrame, tsCol: String, keyCol: String,
               windowLength: String = "1 hour",
               watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col(keyCol), col("n_events"))
}
