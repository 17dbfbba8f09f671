package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Seeded-permutation training shuffle: injectivity, contiguous
  * per-shard ranks, determinism, seed sensitivity, the out-of-range
  * guard, and the no-single-partition plan shape. */
class ShardShuffleSpec extends SparkSpecBase {
  import spark.implicits._

  private val n = 500L
  private def ids = spark.range(n).withColumnRenamed("id", "doc_id")

  test("permuted keys are injective (a true permutation, not a hash)") {
    val out = ShardShuffle.shuffleToShards(ids, "doc_id", 8, seed = 12L)
    assert(out.select("skey").distinct().count() === n)
  }

  test("per-shard positions are a contiguous 0..n-1 rank") {
    val stats = ShardShuffle.shardStats(ids, "doc_id", 8, seed = 12L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.map(_._2).sum === n)
    stats.foreach { case (shard, nDocs, minPos, maxPos) =>
      assert(minPos === 0L, s"shard $shard min pos")
      assert(maxPos === nDocs - 1, s"shard $shard max pos contiguity")
    }
    // Balance on the pinned fixture+seed: range slices of a uniform
    // permutation — no shard over 2x the even split.
    assert(stats.map(_._2).max <= 2 * (n / 8))
  }

  test("deterministic across partitionings and reruns") {
    def layout(parts: Int): Map[Long, (Int, Long)] =
      ShardShuffle.shuffleToShards(ids.repartition(parts), "doc_id", 8, 12L)
        .select("doc_id", "shard", "pos_in_shard")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(layout(3) === layout(17))
  }

  test("a different seed produces a different layout") {
    def keys(seed: Long): Seq[Long] =
      ShardShuffle.shuffleToShards(ids, "doc_id", 8, seed)
        .orderBy("doc_id").select("skey").as[Long].collect().toSeq
    assert(keys(12L) !== keys(13L))
    // and each is still a permutation
    assert(keys(13L).distinct.size === n.toInt)
  }

  test("ids outside [0, P) raise in-plan instead of silently colliding") {
    val bad = Seq(ShardShuffle.P + 1L).toDF("doc_id")
    val e = intercept[Exception] {
      ShardShuffle.shuffleToShards(bad, "doc_id", 4, 12L).collect()
    }
    assert(e.getMessage.contains("ShardShuffle") ||
      Option(e.getCause).exists(_.getMessage.contains("ShardShuffle")))
  }

  test("plan shape: the rank window is partitioned, never single-partition") {
    val plan = ShardShuffle.shuffleToShards(ids, "doc_id", 8, 12L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window would serialize the shuffle:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"expected the window exchange keyed on shard:\n$plan")
  }
}
