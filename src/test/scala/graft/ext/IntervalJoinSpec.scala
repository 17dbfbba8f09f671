package graft.ext

import graft.SparkSpecBase

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Grid-bucketed point-in-interval join: inclusive boundaries,
  * exactly-once matching across bucket crossings, degenerate intervals,
  * a random-data equivalence check against the naive quadratic scan,
  * and the no-nested-loop plan shape. */
class IntervalJoinSpec extends SparkSpecBase {

  test("inclusive bounds, bucket crossings match exactly once, hi<lo matches nothing") {
    val s = spark; import s.implicits._
    val points = Seq(
      (1L, "a", 10L), (2L, "a", 15L), (3L, "a", 16L),
      (4L, "a", 95L),  // same bucket (width 10) as interval start of i4
      (5L, "b", 12L)   // right key value, wrong key column match check
    ).toDF("pid", "k", "p")
    val intervals = Seq(
      (100L, "a", 10L, 15L),  // spans buckets 1..1? width 10: 10/10=1, 15/10=1
      (101L, "a", 8L, 32L),   // spans buckets 0..3 — crosses 3 boundaries
      (102L, "a", 20L, 12L),  // hi < lo: matches nothing
      (103L, "a", 90L, 99L),
      (104L, "b", 12L, 12L)   // single-point interval
    ).toDF("iid", "k", "lo", "hi")
    val got = IntervalJoin.pointInInterval(points, intervals,
        Seq("k"), Seq("k"), "p", "lo", "hi", bucketWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    assert(got === Seq(
      (1L, 100L), (1L, 101L),           // p=10: both ends inclusive
      (2L, 100L), (2L, 101L),           // p=15: hi boundary inclusive
      (3L, 101L),                        // p=16: only the wide interval
      (4L, 103L),                        // p=95
      (5L, 104L)                         // single-point interval, key b
    ))
    // the bucket-crossing interval 101 matched each point ONCE
    assert(got.size === got.distinct.size)
  }

  private val pointGen: Gen[(Long, Long)] = for {
    k <- Gen.choose(0L, 2L)
    p <- Gen.choose(-20L, 40L) // negative domain exercises floor bucketing
  } yield (k, p)
  private val ivGen: Gen[(Long, Long, Long)] = for {
    k <- Gen.choose(0L, 2L)
    lo <- Gen.choose(-20L, 40L)
    span <- Gen.choose(-2L, 25L) // some degenerate hi<lo intervals
  } yield (k, lo, lo + span)

  test("random data: grid join == naive quadratic scan, for several bucket widths") {
    val s = spark; import s.implicits._
    for (seed <- 1L to 3L) {
      val pts = Gen.listOfN(30, pointGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((k, p), i) => (i.toLong, k, p) }
      val ivs = Gen.listOfN(30, ivGen)
        .apply(Gen.Parameters.default, Seed(seed + 50)).get
        .zipWithIndex.map { case ((k, lo, hi), i) => (1000L + i, k, lo, hi) }
      val want = (for {
        (pid, pk, p) <- pts
        (iid, ik, lo, hi) <- ivs
        if pk == ik && p >= lo && p <= hi
      } yield (pid, iid)).sorted
      val pDf = pts.toDF("pid", "k", "p")
      val iDf = ivs.toDF("iid", "k", "lo", "hi")
      for (w <- Seq(1L, 7L, 100L)) {
        val got = IntervalJoin.pointInInterval(pDf, iDf,
            Seq("k"), Seq("k"), "p", "lo", "hi", bucketWidth = w)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got === want, s"seed=$seed width=$w")
      }
    }
  }

  test("bucketing is exact beyond 2^53 (double-cast bucketing lost pairs there)") {
    val s = spark; import s.implicits._
    // 2^53 + 1 is not representable as a double: a double-based
    // floor(v/w) can misplace the point or the interval edge by one
    // bucket and silently drop the pair
    val big = (1L << 53) + 1L
    val p = Seq((1L, "k", big)).toDF("pid", "key", "p")
    val i = Seq((100L, "k", big - 1L, big + 1L)).toDF("iid", "key", "lo", "hi")
    val got = IntervalJoin.pointInInterval(p, i, Seq("key"), Seq("key"),
        "p", "lo", "hi", bucketWidth = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 100L)))
    // and a non-integral domain is rejected loudly instead of rounding
    val dbl = Seq((1L, "k", 1.5)).toDF("pid", "key", "p")
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(dbl, i, Seq("key"), Seq("key"),
        "p", "lo", "hi", bucketWidth = 7L)
    }
  }

  test("colliding non-key column names are rejected") {
    val s = spark; import s.implicits._
    val p = Seq((1L, 1L)).toDF("x", "p")
    val i = Seq((1L, 0L, 5L)).toDF("x", "lo", "hi")
    // x is NOT declared as a key pair → collision must be rejected
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(p, i, Seq("p"), Seq("lo"),
        "p", "lo", "hi", 10L)
    }
  }

  test("reserved internal names (__b, __pt, __iv) in either input are rejected") {
    val s = spark; import s.implicits._
    // an input column named __b would be silently replaced by the bucket
    // column and re-emitted as bucket values — reject instead
    val pBad = Seq((1L, "k", 3L, 9L)).toDF("pid", "key", "p", "__b")
    val i = Seq((100L, "k", 0L, 5L)).toDF("iid", "key", "lo", "hi")
    val e1 = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(pBad, i, Seq("key"), Seq("key"),
        "p", "lo", "hi", 10L)
    }
    assert(e1.getMessage.contains("__b"))
    val p = Seq((1L, "k", 3L)).toDF("pid", "key", "p")
    val iBad = Seq((100L, "k", 0L, 5L, 1L)).toDF("iid", "key", "lo", "hi", "__iv")
    val e2 = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(p, iBad, Seq("key"), Seq("key"),
        "p", "lo", "hi", 10L)
    }
    assert(e2.getMessage.contains("__iv"))
  }

  test("plan: equi-join on (key, bucket), no nested loop, no cartesian") {
    val s = spark; import s.implicits._
    val p = Seq((1L, "a", 10L)).toDF("pid", "k", "p")
    val i = Seq((100L, "a", 5L, 15L)).toDF("iid", "k", "lo", "hi")
    val plan = IntervalJoin.pointInInterval(p, i, Seq("k"), Seq("k"),
      "p", "lo", "hi", 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join planned a nested loop:\n$plan")
  }
}
