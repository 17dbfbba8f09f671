package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.lit

/** As-of join semantics: backward match, left-outer nulls, inclusive vs
  * strict boundaries, deterministic tie resolution, and the one-shuffle
  * plan shape the 100 TB claim rests on. */
class AsOfJoinSpec extends SparkSpecBase {

  private def asof(inclusive: Boolean = true) = {
    val s = spark; import s.implicits._
    val clicks = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 15L), (4L, "a", 25L),
      (5L, "b", 50L) // user with no views at all
    ).toDF("event_id", "user", "t")
    val views = Seq(
      (101L, "a", 10L, 1.0), (102L, "a", 20L, 2.0)
    ).toDF("event_id", "user", "t", "score")
    AsOfJoin.backward(clicks, views,
      leftKeys = Seq("user"), rightKeys = Seq("user"),
      leftTime = "t", rightTime = "t",
      payload = Seq("event_id", "score"), rightTiebreak = "event_id",
      inclusive = inclusive)
      .orderBy("event_id")
      .select("event_id", "asof_event_id", "asof_score")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
  }

  test("backward match per click, left-outer null before any view / for keyless users") {
    assert(asof().toSeq === Seq(
      (1L, null, null),        // t=5: before any view
      (2L, 101L, 1.0),         // t=10: equal timestamp matches (inclusive)
      (3L, 101L, 1.0),         // t=15: latest at-or-before is t=10
      (4L, 102L, 2.0),         // t=25: latest is t=20
      (5L, null, null)))       // user b has no views
  }

  test("strict mode excludes the equal-timestamp right row") {
    assert(asof(inclusive = false).toSeq === Seq(
      (1L, null, null),
      (2L, null, null),        // t=10 view no longer matches the t=10 click
      (3L, 101L, 1.0),
      (4L, 102L, 2.0),
      (5L, null, null)))
  }

  test("ties on (key, time) resolve to the highest tiebreak, all payload columns together") {
    val s = spark; import s.implicits._
    val clicks = Seq((1L, "a", 10L)).toDF("event_id", "user", "t")
    val views = Seq(
      (101L, "a", 10L, 1.0), (102L, "a", 10L, 2.0), (99L, "a", 10L, 0.5)
    ).toDF("event_id", "user", "t", "score")
    val out = AsOfJoin.backward(clicks, views, Seq("user"), Seq("user"),
      "t", "t", Seq("event_id", "score"), rightTiebreak = "event_id")
      .select("asof_event_id", "asof_score").head()
    assert(out === Row(102L, 2.0)) // highest id wins, score comes WITH it
  }

  private def asofFwd(inclusive: Boolean = true) = {
    val s = spark; import s.implicits._
    val clicks = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 15L), (4L, "a", 25L),
      (5L, "b", 50L)
    ).toDF("event_id", "user", "t")
    val views = Seq(
      (101L, "a", 10L), (102L, "a", 20L)
    ).toDF("event_id", "user", "t")
    AsOfJoin.forward(clicks, views,
      leftKeys = Seq("user"), rightKeys = Seq("user"),
      leftTime = "t", rightTime = "t",
      payload = Seq("event_id"), rightTiebreak = "event_id",
      inclusive = inclusive)
      .orderBy("event_id")
      .select("event_id", "asof_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
  }

  test("forward finds the earliest view at-or-after; inclusive boundary; ties to lowest id") {
    assert(asofFwd().toSeq === Seq(
      (1L, 101L),   // t=5 → next view at 10
      (2L, 101L),   // t=10 → equal timestamp matches (inclusive)
      (3L, 102L),   // t=15 → next is 20
      (4L, null),   // t=25 → nothing after
      (5L, null)))
    assert(asofFwd(inclusive = false)(1) === ((2L, 102L))) // strict: skips t=10
    val s = spark; import s.implicits._
    val oneClick = Seq((1L, "a", 10L)).toDF("event_id", "user", "t")
    val tiedViews = Seq((102L, "a", 10L), (99L, "a", 10L), (101L, "a", 10L))
      .toDF("event_id", "user", "t")
    val tied = AsOfJoin.forward(oneClick, tiedViews, Seq("user"), Seq("user"),
      "t", "t", Seq("event_id"), rightTiebreak = "event_id").head()
    assert(tied.getLong(3) === 99L) // forward ties: EARLIEST (lowest id) wins
  }

  test("tolerance masks matches farther than the bound, in both directions") {
    val s = spark; import s.implicits._
    val clicks = Seq((1L, "a", 100L), (2L, "a", 13L)).toDF("event_id", "user", "t")
    val views = Seq((101L, "a", 10L)).toDF("event_id", "user", "t")
    val back = AsOfJoin.backward(clicks, views, Seq("user"), Seq("user"),
      "t", "t", Seq("event_id"), rightTiebreak = "event_id",
      tolerance = Some(lit(5L)))
      .orderBy("event_id").select("asof_event_id").collect()
    assert(back(0).isNullAt(0), "match at distance 90 must mask under tolerance 5")
    assert(back(1).getLong(0) === 101L, "match at distance 3 must survive")
    val fwdClicks = Seq((1L, "a", 2L), (2L, "a", 8L)).toDF("event_id", "user", "t")
    val fwd = AsOfJoin.forward(fwdClicks, views, Seq("user"), Seq("user"),
      "t", "t", Seq("event_id"), rightTiebreak = "event_id",
      tolerance = Some(lit(5L)))
      .orderBy("event_id").select("asof_event_id").collect()
    assert(fwd(0).isNullAt(0), "forward distance 8 masks under tolerance 5")
    assert(fwd(1).getLong(0) === 101L, "forward distance 2 survives")
  }

  test("null keys never match (SQL join semantics), on either side") {
    val s = spark; import s.implicits._
    val clicks = Seq(
      (1L, Option("a"), 10L),
      (2L, Option.empty[String], 10L) // null-key left row
    ).toDF("event_id", "user", "t")
    val views = Seq(
      (101L, Option("a"), 5L),
      (102L, Option.empty[String], 5L) // null-key right row: matches nothing
    ).toDF("event_id", "user", "t")
    val out = AsOfJoin.backward(clicks, views, Seq("user"), Seq("user"),
        "t", "t", Seq("event_id"), rightTiebreak = "event_id")
      .orderBy("event_id").select("event_id", "asof_event_id").collect()
    assert(out(0).getLong(1) === 101L)   // real key matches normally
    assert(out(1).isNullAt(1),           // null != null in a join
      "null-key rows must not match each other")
  }

  test("null times never match: left null-time masks, right null-time drops, both directions") {
    val s = spark; import s.implicits._
    val clicks = Seq(
      (1L, "a", Option(10L)),
      (2L, "a", Option.empty[Long]) // null-time left row
    ).toDF("event_id", "user", "t")
    val views = Seq(
      (101L, "a", Option(5L)),
      (102L, "a", Option.empty[Long]), // null-time right row
      (103L, "a", Option(20L))
    ).toDF("event_id", "user", "t")
    def run(forward: Boolean) = {
      val joined = if (forward)
        AsOfJoin.forward(clicks, views, Seq("user"), Seq("user"),
          "t", "t", Seq("event_id"), rightTiebreak = "event_id")
      else
        AsOfJoin.backward(clicks, views, Seq("user"), Seq("user"),
          "t", "t", Seq("event_id"), rightTiebreak = "event_id")
      joined.orderBy("event_id").select("event_id", "asof_event_id").collect()
    }
    val back = run(forward = false)
    assert(back(0).getLong(1) === 101L) // t=10 → view at 5, NOT the null-time row
    assert(back(1).isNullAt(1), "null-time left row must not match (backward)")
    val fwd = run(forward = true)
    assert(fwd(0).getLong(1) === 103L)  // t=10 → next view at 20
    assert(fwd(1).isNullAt(1), "null-time left row must not match (forward)")
  }

  test("plan: exactly one shuffle, no cartesian product, no nested loop") {
    val s = spark; import s.implicits._
    val clicks = Seq((1L, "a", 5L)).toDF("event_id", "user", "t")
    val views = Seq((101L, "a", 4L, 1.0)).toDF("event_id", "user", "t", "score")
    val p = AsOfJoin.backward(clicks, views, Seq("user"), Seq("user"),
      "t", "t", Seq("event_id"), rightTiebreak = "event_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of join planned a cross product:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles === 1, s"expected exactly 1 shuffle, got $shuffles:\n$p")
  }
}
