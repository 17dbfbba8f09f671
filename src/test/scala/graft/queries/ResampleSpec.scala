package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.SparkSpecBase

/** Hourly resample family: the dense axis dtype contract (NTZ — the
  * r13 gapfill failure was a tz-aware axis) and the LOCF / linear
  * interpolation fill semantics over the sf0.001 corpus. */
class ResampleSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("gapfill axis is TIMESTAMP_NTZ (oracle dtype contract)") {
    val df = RelationalQueries.eventsHourlyGapfill(spark, sf)
    assert(df.schema("hour_start").dataType === TimestampNTZType)
  }

  test("locf/interp share the gapfill axis row-for-row") {
    val gap = RelationalQueries.eventsHourlyGapfill(spark, sf)
      .select("hour_start", "event_type")
    val locf = RelationalQueries.eventsHourlyLocf(spark, sf)
      .select("hour_start", "event_type")
    val itp = RelationalQueries.eventsHourlyInterp(spark, sf)
      .select("hour_start", "event_type")
    assert(gap.exceptAll(locf).isEmpty && locf.exceptAll(gap).isEmpty)
    assert(gap.exceptAll(itp).isEmpty && itp.exceptAll(gap).isEmpty)
  }

  test("observed hours pass through both fills exactly") {
    val gap = RelationalQueries.eventsHourlyGapfill(spark, sf)
      .where(col("n_events") > 0)
    val locf = RelationalQueries.eventsHourlyLocf(spark, sf)
    val itp = RelationalQueries.eventsHourlyInterp(spark, sf)
    val badLocf = gap.join(locf, Seq("hour_start", "event_type"))
      .where(col("n_locf") =!= col("n_events")).count()
    val badItp = gap.join(itp, Seq("hour_start", "event_type"))
      .where(col("n_interp_ppm") =!= col("n_events") * lit(1000000L)).count()
    assert(badLocf === 0L && badItp === 0L)
  }

  test("interpolated gap hours lie within [min,max] of their neighbors") {
    // convexity: any filled (non-observed) interp value is bounded by
    // the per-type observed range scaled to ppm — a cheap necessary
    // condition that catches sign/orientation bugs in the blend.
    val gap = RelationalQueries.eventsHourlyGapfill(spark, sf)
    val bounds = gap.where(col("n_events") > 0)
      .groupBy("event_type")
      .agg(min("n_events").as("lo"), max("n_events").as("hi"))
    val itp = RelationalQueries.eventsHourlyInterp(spark, sf)
      .join(gap, Seq("hour_start", "event_type"))
      .where(col("n_events") === 0 && col("n_interp_ppm").isNotNull)
    val out = itp.join(bounds, "event_type")
      .where(col("n_interp_ppm") < lit(0L) ||
        col("n_interp_ppm") > col("hi") * lit(1000000L)).count()
    assert(out === 0L)
  }
}
