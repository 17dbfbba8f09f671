package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-Flat ANN: recall vs the exact baseline on a CLUSTERED corpus
  * (where a data-adapted quantizer must shine), the prune bound the 100
  * TB claim rests on, training determinism, and the no-cartesian plan
  * shape. The clustered fixture matters: on isotropic noise IVF (like
  * LSH) has nothing to adapt to, so these properties are asserted where
  * the operator is actually designed to operate. */
class IvfSpec extends SparkSpecBase {

  /** `centers` well-separated unit directions, `per` points each: the
    * cluster axes are disjoint coordinate blocks (orthogonal centers),
    * points jitter around their center and re-normalize. Seeded —
    * deterministic fixture. */
  private def clustered(dim: Int = 16, centers: Int = 8,
                        per: Int = 40): DataFrame = {
    val rnd = new scala.util.Random(42)
    val cs = Array.tabulate(centers) { c =>
      val v = new Array[Double](dim)
      v(c % dim) = 1.0
      v((c + dim / 2) % dim) = if (c % 2 == 0) 0.5 else -0.5
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = for (c <- 0 until centers; i <- 0 until per) yield {
      val v = cs(c).map(_ + 0.15 * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      ((c * per + i).toLong, v.map(_ / n).toSeq)
    }
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("topK recall >= 0.9 vs brute force on a clustered corpus") {
    val all = clustered()
    val q = all.where(col("vec_id") % 40 === 0) // one query per cluster
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val approx = Ivf.topK(all, q, "vec_id", "embedding", k = 5, model, nProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 (|exact|=${exact.size})")
  }

  test("probe actually prunes: candidates <= 2x the nominal nProbe/nCells fraction") {
    val all = clustered()
    val q = all.where(col("vec_id") % 40 === 0)
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val nCand = Ivf.probeCandidates(all, q, "vec_id", "embedding", model,
      nProbe = 2).count()
    val total = all.count() * q.count()
    val nominal = 2.0 / 8.0
    assert(nCand <= 2 * nominal * total,
      s"candidates $nCand / $total — the probe is not pruning")
    // and candidate pairs are unique by construction (the no-distinct claim)
    val distinctCand = Ivf.probeCandidates(all, q, "vec_id", "embedding",
      model, nProbe = 2).distinct().count()
    assert(nCand === distinctCand, "probe emitted duplicate candidate pairs")
  }

  test("training is deterministic: two runs yield bit-identical centroids") {
    val all = clustered()
    val m1 = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val m2 = Ivf.train(all.repartition(7), "vec_id", "embedding", nCells = 8)
    assert(m1.centroids.length === m2.centroids.length)
    for (c <- m1.centroids.indices)
      assert(m1.centroids(c).toSeq === m2.centroids(c).toSeq,
        s"centroid $c differs across runs/partitionings")
  }

  test("centroids are unit-norm and every vector lands in exactly one in-range cell") {
    val all = clustered()
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    for (c <- model.centroids) {
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n != 1")
    }
    val stats = Ivf.cellStats(all, "embedding", model).collect()
    assert(stats.map(_.getLong(1)).sum === all.count())
    assert(stats.forall { r =>
      r.getInt(0) >= 0 && r.getInt(0) < model.nCells
    })
    // 8 well-separated clusters + 8 cells → the quantizer should find
    // a non-degenerate partition (no single near-universal cell)
    assert(stats.map(_.getLong(1)).max < all.count(),
      "quantizer degenerated to one cell")
  }

  test("a query vector of the wrong dim fails loudly, not with a wrong cell") {
    val s = spark; import s.implicits._
    val all = clustered(dim = 16)
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 4)
    val bad = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ivf.assignCells(bad, "embedding", model).collect()
    }
    assert(e.getMessage != null)
  }

  test("a non-numeric id column is rejected loudly (silent null-cast would de-determinize)") {
    val s = spark; import s.implicits._
    val bad = Seq(("a", Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ivf.train(bad, "vec_id", "embedding", nCells = 1)
    }
    assert(e.getMessage.contains("numeric id"))
  }

  test("duplicate-heavy corpus with more cells than distinct vectors still trains") {
    val s = spark; import s.implicits._
    val dup = Seq.tabulate(6)(i => (i.toLong, Seq(1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val model = Ivf.train(dup, "vec_id", "embedding", nCells = 3)
    assert(model.nCells === 3)
    // all mass in one cell; the surplus seeded cells are empty, not NaN
    assert(model.centroids.forall(_.forall(d => !d.isNaN)))
    val stats = Ivf.cellStats(dup, "embedding", model).collect()
    assert(stats.map(_.getLong(1)).sum === 6L)
  }

  test("nProbe == nCells degenerates to the exact baseline, bit for bit") {
    // Exhaustive probe ≡ brute force: same pairs, same sims, same ranks.
    // This pins the verify stage's scoring contract to bruteForceTopK's —
    // any drift in rounding/tie-breaks between the two paths fails here.
    val all = clustered(centers = 4, per = 20)
    val q = all.where(col("vec_id") < 7)
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 4)
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val ivf = Ivf.topK(all, q, "vec_id", "embedding", k = 5, model, nProbe = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(ivf.toSeq === exact.toSeq)
  }

  test("random corpora with duplicate vectors: exhaustive probe == brute force") {
    val s = spark; import s.implicits._
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      // 60 vectors over only 20 distinct directions → duplicate vectors,
      // duplicate seeds, empty cells; dim 8
      val base = Array.fill(20)(Array.fill(8)(rnd.nextGaussian()))
      val rows = (0 until 60).map { i =>
        (i.toLong, base(rnd.nextInt(20)).toSeq)
      }
      val all = rows.toDF("vec_id", "embedding")
      val q = all.where(col("vec_id") < 10)
      val model = Ivf.train(all, "vec_id", "embedding", nCells = 6)
      val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 4)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
      val ivf = Ivf.topK(all, q, "vec_id", "embedding", k = 4, model, nProbe = 6)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
      assert(ivf.toSeq === exact.toSeq, s"seed=$seed")
    }
  }

  test("save/load round-trips the model bit-identically") {
    val all = clustered()
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf-model").toString
    try {
      Ivf.save(spark, model, s"$dir/m")
      val back = Ivf.load(spark, s"$dir/m")
      assert(back.nCells === model.nCells)
      for (c <- model.centroids.indices)
        assert(back.centroids(c).toSeq === model.centroids(c).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("written index: partition-pruned probe returns exactly the in-memory results") {
    val all = clustered()
    val q = all.where(col("vec_id") < 3) // 3 queries → few probed cells
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    try {
      Ivf.writeIndex(all, "embedding", model, s"$dir/idx")
      val indexed = Ivf.topKIndexed(spark, s"$dir/idx", q, "vec_id",
        "embedding", k = 5, nProbe = 2)
      val inMem = Ivf.topK(all, q, "vec_id", "embedding", k = 5, model,
        nProbe = 2)
      assert(indexed.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ===
        inMem.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq)
      // the scan must carry a partition filter on cell — the serving
      // path reads probed directories, not the corpus
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [cell"),
        s"no partition pruning in indexed probe:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("join-pruned probe path (broadcastProbes=false) matches the collect-pruned one") {
    val all = clustered()
    val q = all.where(col("vec_id") < 3)
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    try {
      Ivf.writeIndex(all, "embedding", model, s"$dir/idx")
      val collectPath = Ivf.topKIndexed(spark, s"$dir/idx", q, "vec_id",
        "embedding", k = 5, nProbe = 2)
      val joinPath = Ivf.topKIndexed(spark, s"$dir/idx", q, "vec_id",
        "embedding", k = 5, nProbe = 2, broadcastProbes = false)
      assert(joinPath.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ===
        collectPath.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("broadcastProbes=false builds the whole search plan with zero driver-side jobs") {
    val all = clustered()
    val q = all.where(col("vec_id") < 3)
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    try {
      Ivf.writeIndex(all, "embedding", model, s"$dir/idx")
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        // Baseline: merely OPENING the index (schema + partition
        // discovery) may launch a listing job; measure it so the
        // assertion isolates what the probe path ADDS — which, with
        // the model pre-loaded, must be nothing (the collect path
        // adds the probe-resolution job; that is the difference).
        spark.read.parquet(s"$dir/idx/data").schema
        Thread.sleep(1000) // listener events post asynchronously
        val baseline = jobs.getAndSet(0)
        val plan = Ivf.topKIndexedWith(spark, model, s"$dir/idx", q,
          "vec_id", "embedding", k = 5, nProbe = 2, broadcastProbes = false)
        plan.queryExecution.optimizedPlan // force analysis + optimization
        Thread.sleep(1000)
        assert(jobs.get() <= baseline,
          s"join-pruned probe path launched ${jobs.get()} jobs during " +
            s"planning (bare index open launches $baseline)")
        assert(plan.count() > 0) // and it actually runs
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("appendToIndex: searches after an append equal a from-scratch index") {
    val all = clustered()
    val first = all.where(col("vec_id") % 3 =!= 0)
    val batch = all.where(col("vec_id") % 3 === 0)
    val q = all.where(col("vec_id") < 3)
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString
    try {
      Ivf.writeIndex(first, "embedding", model, s"$dir/grown")
      Ivf.appendToIndex(batch, "embedding", s"$dir/grown", epoch = "b1")
      Ivf.writeIndex(all, "embedding", model, s"$dir/whole")
      val grown = Ivf.topKIndexed(spark, s"$dir/grown", q, "vec_id",
        "embedding", k = 5, nProbe = 2)
      val whole = Ivf.topKIndexed(spark, s"$dir/whole", q, "vec_id",
        "embedding", k = 5, nProbe = 2)
      assert(grown.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ===
        whole.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("plan: probe join is an equi-join — no cartesian, no nested loop") {
    val all = clustered()
    val model = Ivf.train(all, "vec_id", "embedding", nCells = 8)
    val p = Ivf.topK(all, all.where(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, model, nProbe = 2).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"IVF plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"IVF plans a nested loop:\n$p")
    assert(p.contains("BroadcastExchange"), "query side should broadcast")
  }
}
