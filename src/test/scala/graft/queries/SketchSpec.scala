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

  test("approx length quantiles track the exact quantiles per language") {
    // The evidence behind the rows-only docs_length_quantiles_approx row:
    // with accuracy 1e4 the sketch's rank error is ≤ 1e-4·n, which for
    // these group sizes means the returned element's VALUE must sit
    // within the exact p±0.01-quantile envelope (assert the envelope, not
    // equality — the sketch returns an observed element, not an
    // interpolation, so exact-match would be wrong by construction).
    val sf = "/root/testdata/sf0.001"
    val approx = LlmQueries.docsLengthQuantilesApprox(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for ((lang, qs) <- approx; (p, got) <- Seq(0.5, 0.9, 0.99).zip(qs)) {
      val lens = docs.where(col("lang") === lang)
        .select(col("n_chars").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      def exactAt(q: Double): Double =
        lens(math.min(lens.length - 1, math.max(0, (q * (lens.length - 1)).round.toInt)))
      val lo = exactAt(math.max(0.0, p - 0.01))
      val hi = exactAt(math.min(1.0, p + 0.01))
      assert(got >= lo && got <= hi,
        s"$lang p$p: approx $got outside exact envelope [$lo, $hi]")
    }
  }
}
