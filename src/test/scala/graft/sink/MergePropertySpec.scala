package graft.sink

import graft.SparkSpecBase
import graft.cdc.CdcNormalize

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5 property tests (raw scalacheck generators, deterministic
  * seeds — scalatestplus isn't resolvable offline): for RANDOM CDC event
  * sequences, the engine's merge must equal the naive specification —
  * apply ops per key in (mtime, arrival) order, last-write-wins, delete
  * removes — regardless of how the sequence is chopped into
  * time-monotone batches. */
class MergePropertySpec extends SparkSpecBase {

  private val M = CdcNormalize.MtimeCol
  private val D = CdcNormalize.DeletedCol

  /** (key, value, mtime, deleted) — small domains force key collisions
    * and mtime ties, the interesting cases. */
  private val eventGen: Gen[(Long, String, Long, Boolean)] = for {
    k <- Gen.choose(0L, 5L)
    v <- Gen.alphaLowerStr.map(s => if (s.isEmpty) "x" else s.take(4))
    t <- Gen.choose(0L, 20L)
    d <- Gen.prob(0.25)
  } yield (k, v, t, d)

  private val seqGen: Gen[List[(Long, String, Long, Boolean)]] =
    Gen.listOfN(30, eventGen)

  private def sample(seed: Long): List[(Long, String, Long, Long, Boolean)] =
    seqGen.apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case ((k, v, t, d), i) => (k, v, t, i.toLong, d) }

  /** Naive fold: per key, the event with max (mtime, arrival seq) wins;
    * the key survives iff that winner is not a delete. */
  private def naive(ev: List[(Long, String, Long, Long, Boolean)]): Map[Long, (String, Long)] =
    ev.groupBy(_._1).flatMap { case (k, evs) =>
      val w = evs.maxBy(e => (e._3, e._4))
      if (w._5) None else Some(k -> (w._2, w._3))
    }

  private def toDf(ev: List[(Long, String, Long, Long, Boolean)]): DataFrame = {
    val s = spark; import s.implicits._
    ev.toDF("id", "v", M, "seq", D)
  }

  private def stateOf(df: DataFrame): Map[Long, (String, Long)] =
    df.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("v"), r.getAs[Long](M))).toMap

  test("merge equals the naive fold for random sequences and random time splits") {
    for (seed <- 1L to 10L) {
      val ev = sample(seed)
      val expected = naive(ev)
      val oneShot = KeyedUpsertTable.merge(None, toDf(ev), Seq("id"), M,
        tiebreak = Seq("seq"))
      assert(stateOf(oneShot) === expected, s"one-shot mismatch, seed=$seed")
      // two time-monotone batches; boundary varies with the seed.
      // (Monotonicity is required: a delete tombstone dropped from the
      // state can be resurrected by an older event in a later batch —
      // faithful Hudi-after-compaction semantics, KeyedUpsertTable doc.)
      val boundary = seed * 2
      val b1 = ev.filter(_._3 <= boundary)
      val b2 = ev.filter(_._3 > boundary)
      if (b1.nonEmpty && b2.nonEmpty) {
        val s1 = KeyedUpsertTable.merge(None, toDf(b1), Seq("id"), M, Seq("seq"))
        val s2 = KeyedUpsertTable.merge(Some(s1), toDf(b2), Seq("id"), M, Seq("seq"))
        assert(stateOf(s2) === expected, s"two-batch mismatch, seed=$seed")
      }
    }
  }

  test("bucketed table equals the naive fold for random time-split sequences") {
    for (seed <- 30L to 32L) {
      val ev = sample(seed)
      val expected = naive(ev).map { case (k, (v, _)) => k -> v }
      val root = java.nio.file.Files.createTempDirectory(s"graft-bkt-prop$seed")
      val t = new BucketedUpsertTable(spark, root.toString, Seq("id"),
        nBuckets = 4, tiebreak = Seq("seq"))
      val boundary = 10L
      val b1 = ev.filter(_._3 <= boundary)
      val b2 = ev.filter(_._3 > boundary)
      Seq(b1, b2).filter(_.nonEmpty).foreach(b => t.upsert(toDf(b)))
      val got = t.read().get.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(got === expected, s"bucketed state mismatch, seed=$seed")
    }
  }

  test("mor table equals the naive fold under ARBITRARY batch splits") {
    // Stronger than the COW property: COW needs time-monotone batches
    // (a hard-deleted key is resurrected by an older event in a later
    // batch), but the MOR log RETAINS tombstones, so the fold is
    // split-invariant for arbitrary arrival-order chopping — as long as
    // no compaction erases a tombstone mid-sequence (compaction is
    // deliberate COW-ification; the soak covers it on monotone data).
    for (seed <- 40L to 43L) {
      val ev = sample(seed)
      val expected = naive(ev).map { case (k, (v, _)) => k -> v }
      val root = java.nio.file.Files.createTempDirectory(s"graft-mor-prop$seed")
      val t = new MorUpsertTable(spark, root.toString, Seq("id"),
        nBuckets = 4, tiebreak = Seq("seq"), compactAfter = 100)
      val k = (seed % 3 + 2).toInt // 2-4 chunks, seed-varied
      ev.grouped(math.max(1, ev.length / k)).filter(_.nonEmpty)
        .foreach(c => t.upsert(toDf(c)))
      val got = t.read().get.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(got === expected, s"mor state mismatch, seed=$seed")
    }
  }

  test("empty-batch merge is a no-op (replay safety) for random states") {
    for (seed <- 20L to 23L) {
      val ev = sample(seed)
      val once = KeyedUpsertTable.merge(None, toDf(ev), Seq("id"), M, Seq("seq"))
      val again = KeyedUpsertTable.merge(Some(once), toDf(ev).limit(0),
        Seq("id"), M, Seq("seq"))
      assert(stateOf(once) === stateOf(again), s"no-op merge changed state, seed=$seed")
    }
  }
}
