package graft.queries

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** The evidence behind the rows-only events_approx_distinct row: the
  * HLL++ estimates must sit within a few rsd of the exact distinct
  * counts on the real fixture (rsd 2% → assert 5%, 2.5σ headroom). */
class SketchSpec extends SparkSpecBase {

  test("approx_count_distinct within 5% of exact on the events fixture") {
    val sf = "/root/testdata/sf0.001"
    val approx = RelationalQueries.eventsApproxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = CdcQueries.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(col("value")).as("ev"),
        countDistinct(col("user_id")).as("eu"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (av, au)) <- approx) {
      val (ev, eu) = exact(k)
      def relErr(a: Long, e: Long) = math.abs(a - e).toDouble / math.max(e, 1L)
      assert(relErr(av, ev) < 0.05, s"$k values: approx $av vs exact $ev")
      assert(relErr(au, eu) < 0.05, s"$k users: approx $au vs exact $eu")
    }
  }
}
