package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface over the TPC-H-ish testdata — the query
  * shapes a user of the materialized CDC tables runs (FIXTURES.md §B:
  * "TPC-H-ish tables back the general relational surface").
  *
  * Oracle-parity notes baked into every query:
  *  - monetary aggregates are computed in DECIMAL, not double — double
  *    summation order differs across engines, decimal is exact in both;
  *  - every computed column is aliased identically here and in the DuckDB
  *    SQL (the driver's compare is by column name);
  *  - deterministic ORDER BY everywhere, ties broken by a key column.
  *
  * Scale notes: aggregations are partial-agg-friendly (group-by on low
  * cardinality keys), dimension joins are explicitly `broadcast()`, and
  * the fact table is only scanned with pushed filters + pruned columns
  * (verified via `.explain` — PushedFilters/ReadSchema reach the scan).
  */
object RelationalQueries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary: partial-aggregatable group-by on a
    * 2-value × 2-value key; one shuffle of tiny partial maps. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // Aggregate in DECIMAL (exact, order-independent) — the final
        // cast to double is one deterministic rounding, identical in
        // DuckDB, and avoids Decimal-vs-float dtype skew in the compare.
        sum(dec("l_quantity")).cast("decimal(18,2)").cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("decimal(18,2)").cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("decimal(18,4)").cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-shaped: selective filters pushed to both scans, then
    * key joins; top-10 revenue orders. The customer side is small after
    * its filter → broadcast; lineitem↔orders is the one real shuffle. */
  def q3Revenue(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(spark, sfDir, "orders")
      .where(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("decimal(18,4)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped star join: region→nation→customer→orders→lineitem
    * with the three dimension tables broadcast (they are tiny at every
    * sf), so the plan is one shuffle join (orders↔lineitem) plus
    * broadcast hash joins — no dimension shuffle at any scale. */
  def q5LocalRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = t(spark, sfDir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val region = t(spark, sfDir, "region")
      .where(col("r_name") === "ASIA").select("r_regionkey")
    val cust = t(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val ord = t(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val li = t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust.join(broadcast(nation.join(broadcast(region),
          col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("decimal(18,4)").cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** Salted skew join end-to-end ([[graft.ext.SkewJoin]]): orders carry a
    * DELIBERATELY skewed derived dimension key (~70% of rows land on key
    * 0 — the "default tenant" shape) joined to the 25-row nation dim
    * through `saltedJoin`, which spreads each key over 8 sub-keys via a
    * deterministic scramble of the row-unique `o_orderkey`. Results must
    * be IDENTICAL to the plain join — the DuckDB oracle computes exactly
    * that — while the salt lets the hot key fan out over 8 tasks instead
    * of one straggler (plan-asserted in SessionizeSpec). At 100 TB this
    * is the fallback when AQE can't split the skew (hash-agg build sides,
    * groupBy-feeding joins). */
  def skewJoinSales(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("nkey",
        when(col("o_orderkey") % 10 < 7, lit(0L))
          .otherwise(col("o_orderkey") % 25).cast("long"))
    val dim = t(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("nkey"), col("n_name"))
    graft.ext.SkewJoin.saltedJoin(ord, dim, "nkey", rowId = "o_orderkey", salts = 8)
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("decimal(18,2)").cast("double").as("total_price"))
      .orderBy("n_name")
  }

  /** Window ranking: top-3 orders by totalprice per customer. Single
    * shuffle on o_custkey; rank filter enables Spark's window-group-limit
    * pushdown so partitions truncate early instead of fully sorting. */
  def windowTop3Orders(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("long")) // bigint: DuckDB row_number dtype
      .where(col("rk") <= 3)
      .orderBy("o_custkey", "rk")
  }

  /** Distinct aggregate: suppliers+parts used per return flag. */
  def distinctParts(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Semi-structured: JSON extraction from the events props column,
    * aggregated per event type — `get_json_object` is codegen'd, no UDF. */
  def eventsJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** Event-time windowed aggregation (the tumbling-window shape used by
    * streaming rollups — `window()` aligns to the epoch, so each bucket
    * equals date_trunc('hour')): events per hour per type. Same
    * partial-agg-friendly group-by as q1; one shuffle of tiny maps. */
  def eventsHourly(spark: SparkSession, sfDir: String): DataFrame =
    CdcQueries.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // decimal aggregate: double summation order differs across
        // engines; decimal is exact (q1's oracle-parity pattern)
        sum(col("value").cast("decimal(18,6)")).cast("decimal(18,6)")
          .cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  /** Dense hourly time axis with zero-filled gaps — the resample /
    * gap-fill step every time-series dashboard needs before windowed
    * math (a missing hour must read 0, not vanish): the (hour × type)
    * axis is generated from the corpus's own min/max hour via
    * `sequence(lo, hi, interval 1 hour)` riding the single-row bounds
    * aggregate, crossed with the distinct type set — BOTH axis sides
    * are dimension-sized (hours in the retention window × event
    * types), never event-sized, so the cross join is broadcast
    * territory and the only event-scale work is the one hourly count
    * aggregate it left-joins. Fully live oracle. */
  def eventsHourlyGapfill(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAxis(spark, sfDir)
      .select(col("hour_start"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("hour_start", "event_type")

  /** Shared dense (hour × type) axis with the observed per-hour count
    * attached (`n`, null where no events landed) — the substrate for
    * the zero-fill / LOCF / interpolation resamples. Hours with zero
    * events are indistinguishable from "missing" in an event stream,
    * which is exactly the gap these fills exist to repair. */
  private def hourlyAxis(spark: SparkSession, sfDir: String): DataFrame = {
    val e = CdcQueries.events(spark, sfDir)
      // the corpus ts is parquet-naive (TIMESTAMP_NTZ); date_trunc
      // returns tz-aware TimestampType, so cast back to NTZ or the
      // dtype (not the values) diverges from the oracle axis
      .select(date_trunc("hour", col("ts")).cast("timestamp_ntz")
        .as("hour_start"), col("event_type"))
    val counts = e.groupBy("hour_start", "event_type")
      .agg(count(lit(1)).as("n"))
    val hours = e.agg(min("hour_start").as("lo"), max("hour_start").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("hour_start"))
    val types = e.select("event_type").distinct()
    hours.crossJoin(types)
      .join(counts, Seq("hour_start", "event_type"), "left")
  }

  /** Last-observation-carried-forward fill over the dense hourly axis:
    * each missing hour repeats the most recent observed count for its
    * type; hours before the first observation read 0. One window pass
    * per type partition over the dimension-sized axis — the event-scale
    * work is still just the hourly count aggregate inside the axis. */
  def eventsHourlyLocf(spark: SparkSession, sfDir: String): DataFrame = {
    val wP = Window.partitionBy("event_type").orderBy("hour_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourlyAxis(spark, sfDir)
      .select(col("hour_start"), col("event_type"),
        coalesce(last(col("n"), ignoreNulls = true).over(wP), lit(0L))
          .as("n_locf"))
      .orderBy("hour_start", "event_type")
  }

  /** Linear-interpolation fill over the dense hourly axis, integer-exact:
    * positions are the axis row index per type (the axis is dense, so
    * index arithmetic ≡ hour arithmetic with no timestamp math), the
    * interpolated value is the ppm-scaled convex combination
    * (prev·(nextH−h) + next·(h−prevH))·1e6 div (nextH−prevH) — all
    * BIGINT, truncating division agrees across engines because the
    * numerator is non-negative. Edges with only one neighbor stay null.
    * Bounded: counts × gap × 1e6 ≲ 1e14 at sf0.1, far from overflow. */
  def eventsHourlyInterp(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Window.partitionBy("event_type").orderBy("hour_start")
    val wP = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hourlyAxis(spark, sfDir)
      .withColumn("h", row_number().over(ord).cast("long"))
      .withColumn("obs_h", when(col("n").isNotNull, col("h")))
      .withColumn("prev_v", last(col("n"), ignoreNulls = true).over(wP))
      .withColumn("prev_h", last(col("obs_h"), ignoreNulls = true).over(wP))
      .withColumn("next_v", first(col("n"), ignoreNulls = true).over(wF))
      .withColumn("next_h", first(col("obs_h"), ignoreNulls = true).over(wF))
      .select(col("hour_start"), col("event_type"),
        when(col("n").isNotNull, col("n") * lit(1000000L))
          .otherwise(expr(
            """(prev_v * (next_h - h) + next_v * (h - prev_h)) * 1000000L
              | div (next_h - prev_h)""".stripMargin))
          .as("n_interp_ppm"))
      .orderBy("hour_start", "event_type")
  }

  /** Gap-based sessionization over the events stream (6-hour inactivity
    * gap): per-user sessions with event counts and integer-exact epoch
    * spans. One shuffle on user_id shared by both window passes and the
    * rollup — see [[graft.ext.Sessionize]]. */
  def eventsSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = CdcQueries.events(spark, sfDir)
    graft.ext.Sessionize.sessions(ev, Seq("user_id"),
        unix_millis(col("ts").cast("timestamp")), gapMs = 6L * 3600 * 1000,
        tiebreak = Seq(col("event_id")))
      .orderBy("user_id", "session_id")
  }

  /** As-of attribution: each click joined to the user's most recent
    * view at or before it (left-outer — early clicks attribute to
    * null). The temporal-join operator [[graft.ext.AsOfJoin]]: one
    * shuffle, window-filled, oracle-checked against DuckDB's native
    * ASOF LEFT JOIN. */
  def eventsAsofAttrib(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = CdcQueries.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type")
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.where(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    graft.ext.AsOfJoin.backward(clicks, views,
        leftKeys = Seq("user_id"), rightKeys = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("event_id", "ts"), rightTiebreak = "event_id")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_event_id").as("view_event_id"),
        col("asof_ts").as("view_ts"))
      .orderBy("event_id")
  }

  /** Forward twin of [[eventsAsofAttrib]]: each click joined to the
    * user's NEXT view at or after it — the reversed-scan direction
    * through the same one-shuffle plan, oracle-checked against DuckDB
    * ASOF with the inequality flipped. */
  def eventsAsofNext(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = CdcQueries.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type")
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.where(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    graft.ext.AsOfJoin.forward(clicks, views,
        leftKeys = Seq("user_id"), rightKeys = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("event_id", "ts"), rightTiebreak = "event_id")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_event_id").as("next_view_event_id"),
        col("asof_ts").as("next_view_ts"))
      .orderBy("event_id")
  }

  /** Point-in-interval grid join ([[graft.ext.IntervalJoin]]): each
    * order opens a 30-day window; same-customer lineitem shipments
    * inside the window attribute to it. Day-number domain (the testdata
    * timestamps are day-aligned), 30-day buckets → each interval spans
    * at most 2 buckets. The oracle is DuckDB's native inequality join
    * over the identical frames. */
  def ordersWindowShipments(spark: SparkSession, sfDir: String): DataFrame = {
    val days = (c: Column) =>
      datediff(c.cast("date"), lit("1970-01-01").cast("date")).cast("long")
    val orders = t(spark, sfDir, "orders")
    val pts = t(spark, sfDir, "lineitem")
      .join(orders.select(col("o_orderkey").as("__ok"), col("o_custkey")),
        col("l_orderkey") === col("__ok"))
      .select(col("o_custkey").as("ck"), days(col("l_shipdate")).as("p"))
    val iv = orders.select(col("o_orderkey").as("win_orderkey"),
      col("o_custkey").as("ck"), days(col("o_orderdate")).as("lo"),
      (days(col("o_orderdate")) + 30L).as("hi"))
    graft.ext.IntervalJoin.pointInInterval(pts, iv,
        pointKeys = Seq("ck"), intervalKeys = Seq("ck"),
        pointCol = "p", loCol = "lo", hiCol = "hi", bucketWidth = 30L)
      .groupBy(col("win_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_shipments"))
      .orderBy("o_orderkey")
  }

  /** Pivot (wide aggregation): per-user event counts spread across one
    * column per event type. The value list is FIXED (no collect-distinct
    * pre-job — at 100 TB discovering pivot values costs a full scan;
    * a pipeline pins them), and absent combinations coalesce to 0 to
    * match SQL FILTER-count semantics. */
  def eventsPivotCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    CdcQueries.events(spark, sfDir)
      .groupBy("user_id")
      .pivot("event_type", types)
      .count()
      .select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }

  /** Hierarchical totals: ROLLUP over (returnflag, linestatus) with the
    * grouping id — subtotal rows materialize in ONE aggregation pass
    * (partial-agg friendly), not one job per level. Decimal sums per the
    * q1 oracle-parity discipline. */
  def q1Rollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Window-function breadth in one pass: running decimal sum (explicit
    * ROWS frame), lag-based inter-arrival gap, lead lookahead, and
    * ntile quartiles — all over ONE (user, time, id)-ordered window, so
    * Spark plans a single shuffle + sort shared by every function. The
    * order key is fully deterministic (ties break on event_id); the sum
    * runs in DECIMAL per the q1 oracle-parity discipline. */
  def eventsUserRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val wOrder = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val wFrame = wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    CdcQueries.events(spark, sfDir).select(
      col("event_id"), col("user_id"),
      sum(col("value").cast("decimal(18,6)")).over(wFrame)
        .cast("decimal(18,6)").cast("double").as("run_sum"),
      (unix_millis(col("ts").cast("timestamp")) -
        lag(unix_millis(col("ts").cast("timestamp")), 1).over(wOrder))
        .as("gap_ms"),
      lead(col("event_type"), 1).over(wOrder).as("next_type"),
      ntile(4).over(wOrder).cast("long").as("quartile"))
    .orderBy("event_id")
  }

  /** Unpivot (melt — the reshape inverse of [[eventsPivotCounts]]):
    * the three charge components become (component, amount) rows via
    * Spark's native `unpivot` (a Generate, map-side — no shuffle until
    * the aggregate), then a per-flag decimal rollup. */
  def lineitemUnpivotCharges(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        variableColumnName = "component",
        valueColumnName = "amount")
      .groupBy("l_returnflag", "component")
      .agg(sum(col("amount").cast("decimal(18,6)")).cast("decimal(18,6)")
          .cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "component")

  /** TPC-H q18 shape (large-volume orders): an aggregate-HAVING subquery
    * gates the main join via LEFT SEMI — the build side shrinks to
    * qualifying orderkeys BEFORE the wide join, and the final top-100
    * rides the sort-limit (TakeOrderedAndProject, no full sort).
    * Deterministic limit: ties break on o_orderkey. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("__q"))
      .where(col("__q") > 120)
      .select(col("l_orderkey").as("__big_ok"))
    val oBig = t(spark, sfDir, "orders")
      .join(big, col("o_orderkey") === col("__big_ok"), "left_semi")
    t(spark, sfDir, "customer").select("c_custkey", "c_name")
      .join(oBig, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").cast("double")
          .as("o_totalprice"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
        .cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Set-operation coverage (§2.5: absent in the reference): INTERSECT
    * and EXCEPT both plan as hash semi/anti joins over distinct keys —
    * no sort, partial-distinct map-side. Engaged-vs-converted user
    * audiences from the events stream. */
  def eventsAudienceSets(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = CdcQueries.events(spark, sfDir)
    def users(kind: String) =
      ev.where(col("event_type") === kind).select("user_id")
    val both = users("click").intersect(users("purchase"))
      .select(col("user_id"), lit("click_and_purchase").as("audience"))
    val lost = users("view").except(users("purchase"))
      .select(col("user_id"), lit("view_no_purchase").as("audience"))
    both.unionByName(lost).orderBy("audience", "user_id")
  }

  /** Distributed cardinality sketch (HLL++ via approx_count_distinct,
    * rsd 2%): the 100 TB distinct-count staple — fixed-size mergeable
    * sketches combine map-side, where exact count(DISTINCT) shuffles
    * every value. Rows-only under the driver gate (sketch estimates are
    * engine-specific); the relative-error bound vs the exact counts is
    * asserted in SketchSpec. */
  def eventsApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    CdcQueries.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("value"), rsd = 0.02).as("approx_values"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"))
      .orderBy("event_type")

  /** The HLL++ sketch under the driver gate: joins the estimates
    * ([[eventsApproxDistinct]]) against the exact distinct counts in
    * Spark and emits both sums in one row. Spark's HLL++ is
    * deterministic for fixed data and rsd (no RNG — bucketing is
    * hash-based), so the estimate sums are pinnable per scale factor;
    * the exact sums and the type count are live in the oracle. The
    * error-bound property itself lives in SketchSpec; this row makes an
    * implementation drift (hash, rsd handling, merge) hash-visible. */
  def eventsApproxDistinctCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val approx = eventsApproxDistinct(spark, sfDir)
    val exact = CdcQueries.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("value")).as("__ev"),
        countDistinct(col("user_id")).as("__eu"))
    approx.join(exact, "event_type")
      .agg(
        count(lit(1)).as("n_types"),
        sum("approx_values").as("sum_approx_values"),
        sum("approx_users").as("sum_approx_users"),
        sum("__ev").as("sum_exact_values"),
        sum("__eu").as("sum_exact_users"))
  }

  /** TPC-H q17 shape through the SQL path: a CORRELATED scalar subquery
    * (per-part 20%-of-average threshold) that Catalyst decorrelates
    * into an aggregate + equi-join — no per-row re-execution. The
    * quantity averages are exact in double (integral values, exact
    * partial sums → order-independent), so the filter threshold is
    * engine-reproducible; the money sum stays decimal. */
  def q17AvgYearly(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("q17_lineitem")
    spark.sql(
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |         AS avg_yearly
        |FROM q17_lineitem l1
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM q17_lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
  }

  /** CUBE twin of [[q1Rollup]]: all four grouping sets — including the
    * linestatus-only subtotals ROLLUP skips — still one aggregation
    * pass. */
  def q1Cube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Existence/anti-join shape: customers with no RECENT order (the
    * unfiltered variant is vacuously empty on the dense testdata). The
    * filter is pushed into the build side before the anti join; at 100 TB
    * Spark plans a shuffled left-anti join on the same expression — the
    * declarative form is the point. */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer").select("c_custkey", "c_name")
    val ord = t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
      .select("o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy("c_custkey")
  }

  /** Session-scoped z-order clustered copy of `events` on
    * (user_id, value) — built once per (session, sf) into a
    * shutdown-cleaned temp dir (the [[LlmQueries]] index-cache
    * pattern). */
  private val sharedZOrder =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()

  private def zorderDir(spark: SparkSession, sfDir: String): String = {
    val perSession = sharedZOrder.synchronized {
      sharedZOrder.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, String])
    }
    perSession.getOrElseUpdate(sfDir, {
      val dir = CdcQueries.tempSinkDir("graft-zorder").toString
      graft.sink.ZOrderLayout.write(
        t(spark, sfDir, "events"), Seq("user_id", "value"), dir,
        targetFiles = 32)
      dir
    })
  }

  /** Count-min-sketch heavy-hitter audit: build Spark's own
    * `count_min_sketch` over `user_id` (one KB-scale aggregate,
    * map-side combinable — the hot-key diagnosis you run BEFORE a big
    * join at 100 TB, where an exact per-key count would itself be the
    * expensive shuffle), probe it per distinct key with
    * [[graft.functions.CmsEstimate]], and emit the 1-row contract
    * check: CMS never under-estimates (structural), and with the fixed
    * seed the over-bound count is deterministic (measured 0 at every
    * gated sf). `n_users` is the live-oracle anchor proving the probe
    * actually covered every key. */
  def eventsCmsCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events").select(col("user_id"))
    // eps=0.001 (bound: est <= exact + 0.001*N), confidence 0.999,
    // fixed seed 42 — deterministic on fixed data, ~56 KB sketch
    val bytes = ev.agg(
        expr("count_min_sketch(user_id, 0.001d, 0.999d, 42)").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
    val total = ev.agg(count(lit(1)).as("total_n"))
    exact
      .withColumn("est_n",
        graft.functions.CmsExpressions.estimate(col("user_id"), bytes))
      .crossJoin(broadcast(total))
      .agg(
        count(lit(1)).cast("long").as("n_users"),
        sum(when(col("est_n") < col("exact_n"), 1L).otherwise(0L))
          .cast("long").as("n_under"),
        sum(when(col("est_n") > col("exact_n") +
            ceil(lit(0.001) * col("total_n")).cast("long"), 1L).otherwise(0L))
          .cast("long").as("n_over"))
  }

  /** Rectangle query against the z-order clustered events table
    * ([[graft.sink.ZOrderLayout]]): the manifest prunes data files by
    * BOTH dimensions before any data IO, then the row predicate runs on
    * the surviving files — result provably identical to the full-scan
    * SQL (the oracle). ZOrderLayoutSpec additionally asserts files are
    * genuinely skipped at this shape, so the green hash plus the spec
    * together say "same answer, less IO". */
  def eventsZOrderPruned(spark: SparkSession, sfDir: String): DataFrame =
    graft.sink.ZOrderLayout.readPruned(spark, zorderDir(spark, sfDir),
        Map("user_id" -> (Some(10.0), Some(20.0)),
            "value" -> (Some(5.0), Some(10.0))))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
}
