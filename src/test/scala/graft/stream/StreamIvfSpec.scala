package graft.stream

import graft.SparkSpecBase
import graft.ext.{Ivf, Similarity}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming flag→append e2e on the IVF embedding index: shard 2's
  * report must see shard 1 (the epoch append lands before the next
  * trigger), every reported pair must appear in the exact all-pairs
  * recompute restricted to shard-touching pairs (the subset contract —
  * the found side shares Similarity.pairSim with the exact side), and
  * a crashed replay that excludes its own epoch reads the pre-batch
  * state. */
class StreamIvfSpec extends SparkSpecBase {

  // Two tight clusters far apart: members of a cluster are near-dups
  // (cosine ~1), across clusters cosine ~0 (orthogonal-ish axes).
  private def vec(axis: Int, jitter: Double): Array[Double] = {
    val v = Array.fill(8)(jitter)
    v(axis) = 1.0
    v
  }

  test("each shard is flagged against all prior ingest, then joins the index") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val base = Seq(
      (1L, vec(0, 0.01)), (2L, vec(4, 0.02)), (3L, vec(0, 0.03)))
      .toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("sivf-idx").toString
    val model = Ivf.train(base, "vec_id", "embedding", nCells = 2)
    Ivf.writeIndex(base, "embedding", model, idx)

    val out = Files.createTempDirectory("sivf-out").toString
    val ckpt = Files.createTempDirectory("sivf-ckpt").toString
    val input = MemoryStream[(Long, Array[Double])]
    val q = StreamIvf.start(input.toDF().toDF("vec_id", "embedding"),
      idx, out, ckpt, threshold = 0.9, k = 5, nProbe = 2)
    val shard1 = Seq((10L, vec(0, 0.015)), (11L, vec(4, 0.01)))
    val shard2 = Seq((20L, vec(4, 0.025)), (21L, vec(0, 0.02)))
    try {
      input.addData(shard1: _*)
      q.processAllAvailable()
      input.addData(shard2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // subset of the exact all-pairs recompute restricted per shard
    def restricted(all: Seq[(Long, Array[Double])], newIds: Set[Long]) =
      Similarity.exactCosinePairs(all.toDF("vec_id", "embedding"),
          "vec_id", "embedding", threshold = 0.9)
        .where(col("id_a").isin(newIds.toSeq: _*) ||
          col("id_b").isin(newIds.toSeq: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseSeq = Seq((1L, vec(0, 0.01)), (2L, vec(4, 0.02)), (3L, vec(0, 0.03)))
    val exact =
      restricted(baseSeq ++ shard1, Set(10L, 11L)) ++
        restricted(baseSeq ++ shard1 ++ shard2, Set(20L, 21L))
    assert(got.subsetOf(exact), s"spurious pairs: ${got -- exact}")
    // same-cluster base pair must be found (1 ~ 10 via the index) and
    // 11 ~ 20 proves shard 1's epoch append was visible to shard 2
    assert(got.contains((1L, 10L)))
    assert(got.contains((11L, 20L)))
    // no cross-cluster pair can clear the threshold
    assert(got.forall { case (a, b) => exact.contains((a, b)) })
  }

  test("replayed batch excludes its own epoch: report equals the clean run") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, vec(0, 0.01)), (2L, vec(4, 0.02))).toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, vec(0, 0.015)), (11L, vec(4, 0.01))).toDF("vec_id", "embedding")

    def mk(appendBatch: Boolean): String = {
      val idx = Files.createTempDirectory("sivf-r-idx").toString
      val model = Ivf.train(base, "vec_id", "embedding", nCells = 2)
      Ivf.writeIndex(base, "embedding", model, idx)
      if (appendBatch) // the crashed state: append landed, no commit
        Ivf.appendToIndex(batch, "embedding", idx, "b7")
      idx
    }
    def pairs(idx: String, excl: Seq[String]) =
      Ivf.topKIndexed(spark, idx, batch, "vec_id", "embedding",
          k = 5, nProbe = 2, excludeEpochs = excl)
        .where(col("sim") >= 0.9)
        .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
          greatest(col("query_id"), col("neighbor_id")).as("id_b"),
          col("sim"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val expected = pairs(mk(appendBatch = false), Nil)
    val replayed = pairs(mk(appendBatch = true), Seq("b7"))
    assert(replayed === expected)
    assert(expected.nonEmpty)
    assert(!replayed.exists { case (a, b, _) => a == b })
  }
}
