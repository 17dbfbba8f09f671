package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Fixed-point PageRank against hand-computed references, plus the
  * structural invariants (mass accounting, determinism, dangling
  * behavior) the fixed-point formulation guarantees. */
class PageRankSpec extends SparkSpecBase {
  import spark.implicits._

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle converges toward equal ranks, exact integers") {
    // 0 -> 1 -> 0: symmetric, so every iteration keeps both ranks equal:
    // r' = 150000 + (85 * r) DIV 100, from r = 1000000.
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    var expected = 1000000L
    for (_ <- 1 to 10) expected = 150000L + (85L * expected) / 100L
    val got = rankMap(PageRank.ranks(edges, "src", "dst", iters = 10))
    assert(got === Map(0L -> expected, 1L -> expected))
  }

  test("star graph: hub collects mass, leaves hold base; exact per-iter arithmetic") {
    // Leaves 1..4 each point at hub 0; hub points at leaf 1.
    val edges = (1L to 4L).map(i => (i, 0L)) :+ ((0L, 1L))
    val df = edges.toDF("src", "dst")
    // Scala reference of the same integer iteration.
    val out = Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    var r = Seq(0L, 1L, 2L, 3L, 4L).map(_ -> 1000000L).toMap
    for (_ <- 1 to 7) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = r.keys.map(k => k -> (150000L + 85L * in.getOrElse(k, 0L) / 100L)).toMap
    }
    val got = rankMap(PageRank.ranks(df, "src", "dst", iters = 7))
    assert(got === r)
    assert(got(0L) > got(2L), "hub must outrank a leaf")
    assert(got(2L) === got(3L) && got(3L) === got(4L),
      "symmetric leaves must tie exactly (fixed-point, not float)")
  }

  test("dangling node keeps base rank only (disclosed leak semantics)") {
    // 0 -> 1, 1 has no out-edges: node 1 receives but never contributes.
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val got = rankMap(PageRank.ranks(edges, "src", "dst", iters = 3))
    // Node 0 never receives: base only from iter 1 onward.
    assert(got(0L) === 150000L)
    // Node 1 from iter 2 onward: base + damp(node 0's settled 150000).
    assert(got(1L) === 150000L + 85L * 150000L / 100L)
  }

  test("deterministic across partitionings (integer sums are order-free)") {
    val n = 300L
    val base = spark.range(n).select(col("id").as("src"),
      explode(array((col("id") * col("id") + 1) % n,
        col("id") % 97, (col("id") * 7 + 3) % n)).as("dst"))
    val a = rankMap(PageRank.ranks(base.repartition(3), "src", "dst", iters = 5))
    val b = rankMap(PageRank.ranks(base.repartition(17), "src", "dst", iters = 5))
    assert(a === b)
    assert(a.values.toSet.size > 10, "heterogeneous graph must produce varied ranks")
  }

  test("total mass stays bounded by n*scale (no creation)") {
    val n = 200L
    val edges = spark.range(n).select(col("id").as("src"),
      explode(array((col("id") + 1) % n, (col("id") * 3 + 5) % n)).as("dst"))
    val total = PageRank.ranks(edges, "src", "dst", iters = 6)
      .agg(sum("rank_micros")).as[Long].head()
    assert(total <= n * 1000000L)
    assert(total > n * 900000L, "every node has out-edges: truncation-only loss")
  }

  test("dangling redistribution conserves total mass; the leak variant loses it") {
    // star INTO a sink: every node 1..49 points only at node 0, node 0
    // points nowhere — the harshest dangling case (the highest-rank
    // node leaks every round without the correction)
    val n = 50L
    val iters = 8
    val edges = spark.range(1, n).select(col("id").as("src"),
      lit(0L).as("dst"))
    def total(redistribute: Boolean): Long =
      PageRank.ranks(edges, "src", "dst", iters = iters,
          redistributeDangling = redistribute)
        .agg(sum("rank_micros")).as[Long].head()
    val leaked = total(redistribute = false)
    val conserved = total(redistribute = true)
    // Σrank invariant up to integer truncation: each round loses < 1
    // micro-unit per node at the share division, per edge at the
    // contribution division, and per node at the damping division
    val bound = iters * (2 * n + (n - 1)) // micro-units
    assert(conserved <= n * 1000000L)
    assert(n * 1000000L - conserved <= bound,
      s"conserved total ${conserved} drifted more than truncation allows " +
        s"(${n * 1000000L - conserved} > $bound)")
    // without the correction the sink's mass bleeds out measurably
    assert(leaked < conserved - (n * 1000000L) / 10,
      s"leak variant should lose >10% of total mass here: $leaked vs $conserved")
  }

  test("warm start from a uniform vector reproduces the cold start exactly") {
    val n = 60L
    val edges = spark.range(n).select(col("id").as("src"),
      explode(array((col("id") * col("id") + 1) % n,
        col("id") % 13, (col("id") * 7 + 3) % n)).as("dst"))
    val uniform = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .withColumn("rank_micros", lit(1000000L))
    val cold = rankMap(PageRank.ranks(edges, "src", "dst", iters = 4))
    val warm = rankMap(PageRank.ranksFrom(edges, "src", "dst",
      uniform, "node", "rank_micros", iters = 4))
    assert(cold === warm)
  }

  test("warm start: carried nodes resume from init, new nodes start at scale") {
    val s = spark; import s.implicits._
    // old graph: 1→2→1 cycle; refresh adds node 3 with 3→1
    val oldEdges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val init = PageRank.ranks(oldEdges, "src", "dst", iters = 6)
    val allEdges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val warm = rankMap(PageRank.ranksFrom(allEdges, "src", "dst",
      init, "node", "rank_micros", iters = 1))
    val initMap = rankMap(init)
    // one warm round, hand-computed: node 3 dangles into 1
    val exp1 = 150000L + 85L * (initMap(2L) / 1 + 1000000L / 1) / 100L
    val exp2 = 150000L + 85L * (initMap(1L) / 1) / 100L
    val exp3 = 150000L // no in-links
    assert(warm === Map(1L -> exp1, 2L -> exp2, 3L -> exp3))
  }

  test("warm start converges to the cold fixed point in fewer rounds") {
    val n = 120L
    val all = spark.range(n).select(col("id").as("src"),
      explode(array((col("id") * col("id") + 1) % n,
        col("id") % 31, (col("id") * 7 + 3) % n)).as("dst"))
    // a SMALL refresh (3 of 120 sources new) — warm start pays off when
    // the stored vector is near the new fixed point; a bulk rewrite of
    // the graph (say 10% of sources) can put uniform init closer
    val old = all.where(col("src") % 50 =!= 0)
    // mass-conserving cold phase: the removed sources dangle in the old
    // graph, and letting them LEAK depresses the whole stored vector —
    // a warm start from a low-mass vector can lose to uniform init
    val init = PageRank.ranks(old, "src", "dst", iters = 10,
      redistributeDangling = true)
    val target = rankMap(PageRank.ranks(all, "src", "dst", iters = 20))
    def dist(m: Map[Long, Long]) =
      target.map { case (k, v) => math.abs(m.getOrElse(k, 1000000L) - v) }.sum
    val warm4 = rankMap(PageRank.ranksFrom(all, "src", "dst",
      init, "node", "rank_micros", iters = 4))
    val cold4 = rankMap(PageRank.ranks(all, "src", "dst", iters = 4))
    assert(dist(warm4) < dist(cold4),
      s"warm start should be closer to the fixed point: ${dist(warm4)} vs ${dist(cold4)}")
  }

  test("redistribution is deterministic across partitionings") {
    val n = 120L
    // every 7th node dangles; the rest scatter three ways
    val base = spark.range(n).where(col("id") % 7 =!= 0)
      .select(col("id").as("src"),
        explode(array((col("id") * col("id") + 1) % n,
          col("id") % 31, (col("id") * 7 + 3) % n)).as("dst"))
    val a = rankMap(PageRank.ranks(base.repartition(3), "src", "dst",
      iters = 5, redistributeDangling = true))
    val b = rankMap(PageRank.ranks(base.repartition(17), "src", "dst",
      iters = 5, redistributeDangling = true))
    assert(a === b)
  }
}
