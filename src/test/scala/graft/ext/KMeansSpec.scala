package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point distributed Lloyd k-means. */
class KMeansSpec extends SparkSpecBase {

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("planted well-separated clusters each collapse into one cell") {
    val rnd = new scala.util.Random(3)
    def around(c: Array[Float]) =
      c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq
    val c1 = Array(1f, 0f, 0f, 0f); val c2 = Array(0f, 1f, 0f, 0f)
    val c3 = Array(0f, 0f, 1f, 0f)
    val rows = (0 until 30).map { i =>
      (i.toLong, around(Seq(c1, c2, c3)(i % 3).toArray))
    }
    val (_, assigned) = KMeans.train(vecs(rows: _*), "vec_id", "embedding",
      k = 3, iters = 4)
    val byCluster = assigned.collect()
      .map(r => (r.getLong(0) % 3, r.getAs[Long]("cell")))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    // every planted cluster maps to exactly one cell, and cells differ
    assert(byCluster.values.forall(_.size == 1), s"split cluster: $byCluster")
    assert(byCluster.values.flatten.toSet.size === 3)
  }

  test("assignments are deterministic under repartition") {
    val rnd = new scala.util.Random(9)
    val rows = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val d = vecs(rows: _*)
    def run(df: DataFrame) = KMeans.train(df, "vec_id", "embedding",
        k = 4, iters = 3)._2
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cell")).toMap
    assert(run(d) === run(d.repartition(13)),
      "fixed-point k-means must not depend on partitioning")
  }

  test("argmin ties break to the smallest cell; empty cells keep their seed") {
    // assignment against two IDENTICAL centroids: every vector is
    // equidistant, so all must land in cell 0 (array_position finds
    // the first minimum)
    val d = vecs((0L, Seq(1f, 1f)), (1L, Seq(0.5f, 2f)), (2L, Seq(-1f, 0f)))
    val q = KMeans.quantize(d, "vec_id", "embedding", 1000000.0)
    val same = KMeans.Model(Array(Array(7L, 7L), Array(7L, 7L)))
    assert(KMeans.assign(q, "vec_id", same).collect()
      .forall(_.getAs[Long]("cell") === 0L), "ties must break to cell 0")
    // a k=3 run over 3 identical points: cells 1 and 2 never win the
    // tie-break, so both keep their seeds verbatim
    val ident = vecs((0L, Seq(1f, 2f)), (1L, Seq(1f, 2f)), (2L, Seq(1f, 2f)))
    val (m3, a3) = KMeans.train(ident, "vec_id", "embedding", k = 3, iters = 2)
    assert(a3.collect().forall(_.getAs[Long]("cell") === 0L))
    assert(m3.centroids(1).toSeq === Seq(1000000L, 2000000L) &&
      m3.centroids(2).toSeq === Seq(1000000L, 2000000L),
      "empty cells must keep their seed centroids")
  }

  test("assignment plan is map-side: no join, no shuffle") {
    val d = vecs((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
    val q = KMeans.quantize(d, "vec_id", "embedding", 1000000.0)
    val model = KMeans.Model(Array(Array(1000000L, 0L), Array(0L, 1000000L)))
    val p = KMeans.assign(q, "vec_id", model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"assignment must be a pure projection:\n$p")
  }

  test("quantization floors toward negative infinity like the oracle") {
    val d = vecs((0L, Seq(0.1f, -0.25f, -0.0000001f)))
    val q = KMeans.quantize(d, "vec_id", "embedding", 1000000.0)
      .collect()(0).getAs[scala.collection.Seq[Long]]("qv")
    // 0.1f widens to 0.100000001490..., floor at 1e6 scale = 100000;
    // -0.25f is exact; the tiny negative floors DOWN to -1, not 0
    assert(q.toSeq === Seq(100000L, -250000L, -1L))
  }
}
