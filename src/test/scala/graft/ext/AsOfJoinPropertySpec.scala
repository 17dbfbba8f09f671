package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions.lit
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test (raw scalacheck generators, deterministic seeds — same
  * offline discipline as MergePropertySpec): for RANDOM left/right
  * tables with small key/time domains (forcing key collisions, time
  * ties, and keyless rows — the interesting cases), the one-shuffle
  * window formulation must equal the naive per-row scan specification
  * across every (direction, bound, tolerance) combination. */
class AsOfJoinPropertySpec extends SparkSpecBase {

  /** (id, key, t, payload) rows; ids unique per side by construction.
    * Keys and times are OPTIONAL: nulls exercise the SQL-semantics rule
    * that a null key or time matches nothing. */
  private val rowGen: Gen[(Option[Long], Option[Long])] = for {
    k <- Gen.frequency(9 -> Gen.choose(0L, 3L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    t <- Gen.frequency(9 -> Gen.choose(0L, 15L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
  } yield (k, t)

  private def sample(seed: Long, n: Int,
                     idBase: Long): List[(Long, Option[Long], Option[Long], Double)] =
    Gen.listOfN(n, rowGen).apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex
      .map { case ((k, t), i) => (idBase + i, k, t, (idBase + i) * 0.5) }

  /** Naive spec: scan all right rows per left row. Backward: max t with
    * t <= lt (or < when strict), ties to highest id; forward: min t with
    * t >= lt (or >), ties to lowest id; tolerance masks by distance.
    * A null key or time on either side admits nothing (SQL join
    * semantics). */
  private def naive(left: List[(Long, Option[Long], Option[Long], Double)],
                    right: List[(Long, Option[Long], Option[Long], Double)],
                    forward: Boolean, inclusive: Boolean,
                    tolerance: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (lid, lkO, ltO, _) =>
      val cands = right.filter { case (_, rkO, rtO, _) =>
        (lkO, ltO, rkO, rtO) match {
          case (Some(lk), Some(lt), Some(rk), Some(rt)) =>
            rk == lk && (
              if (forward) { if (inclusive) rt >= lt else rt > lt }
              else { if (inclusive) rt <= lt else rt < lt })
          case _ => false
        }
      }
      val best =
        if (cands.isEmpty) None
        else if (forward) Some(cands.minBy { case (rid, _, rt, _) => (rt, rid) })
        else Some(cands.maxBy { case (rid, _, rt, _) => (rt, rid) })
      val masked = best.filter { case (_, _, rtO, _) =>
        tolerance.forall { tol =>
          // best nonEmpty ⇒ this left row's time and the match's time exist
          val (rt, lt) = (rtO.get, ltO.get)
          (if (forward) rt - lt else lt - rt) <= tol
        }
      }
      lid -> masked.map(_._1)
    }.toMap

  test("window formulation == naive scan across directions, bounds, tolerances, seeds") {
    val s = spark; import s.implicits._
    for (seed <- 1L to 5L) {
      val lRows = sample(seed, n = 25, idBase = 1000)
      val rRows = sample(seed + 100, n = 25, idBase = 2000)
      val l = lRows.toDF("event_id", "k", "t", "val")
      val r = rRows.toDF("event_id", "k", "t", "val")
      for {
        forward <- Seq(false, true)
        inclusive <- Seq(true, false)
        tol <- Seq(None, Some(3L))
      } {
        val run = if (forward)
          AsOfJoin.forward(l, r, Seq("k"), Seq("k"), "t", "t",
            Seq("event_id", "val"), "event_id", inclusive,
            tol.map(lit(_)))
        else
          AsOfJoin.backward(l, r, Seq("k"), Seq("k"), "t", "t",
            Seq("event_id", "val"), "event_id", inclusive,
            tol.map(lit(_)))
        val got = run.select("event_id", "asof_event_id", "asof_val").collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
        val want = naive(lRows, rRows, forward, inclusive, tol)
        assert(got === want,
          s"seed=$seed forward=$forward inclusive=$inclusive tol=$tol")
        // payload columns travel together: asof_val must belong to the
        // matched asof_event_id (val = id * 0.5 by construction)
        run.select("asof_event_id", "asof_val").collect().foreach { row =>
          if (!row.isNullAt(0))
            assert(row.getDouble(1) === row.getLong(0) * 0.5,
              s"payload tore: ${row.getLong(0)} vs ${row.getDouble(1)}")
        }
      }
    }
  }
}
