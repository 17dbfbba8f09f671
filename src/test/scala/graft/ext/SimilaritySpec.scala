package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Similarity search: cosine hand checks, exact top-k ranking, and the
  * LSH recall bound vs the exact baseline (the claim the registry's
  * rows-only queries rely on). */
class SimilaritySpec extends SparkSpecBase {

  test("cosine: orthogonal → 0, identical → 1, opposite → -1") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(2.0f, 2.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))
    ).toDF("a", "b")
    val sims = df.select(round(Similarity.cosine(col("a"), col("b")), 6).as("sim"))
      .collect().map(_.getDouble(0))
    assert(sims.toSeq === Seq(0.0, 1.0, -1.0))
  }

  test("dot on mismatched vector lengths yields null, not a truncated score") {
    val s = spark; import s.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b")).as("d")).head()
    assert(r.isNullAt(0))
  }

  test("bruteForceTopK ranks by similarity with deterministic ties") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus, corpus.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L))
  }

  test("lshTopK recall >= 0.9 vs exact baseline on real embeddings") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = all.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(all, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(all, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"lsh recall $recall < 0.9")
  }

  test("a vector wider than MaxDim is rejected loudly, never truncated") {
    val s = spark; import s.implicits._
    val wide = Seq((1L, Seq.fill(Similarity.MaxDim + 1)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      wide.select(Similarity.lshBucket(col("embedding"), nPlanes = 4)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("exceeds the plane family dim")))
  }

  test("lshTopK with broadcastQueries=false returns identical results") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = all.where(col("vec_id") < 10)
    def run(bc: Boolean) =
      Similarity.lshTopK(all, q, "vec_id", "embedding", k = 5, broadcastQueries = bc)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run(true) === run(false))
  }

  test("candidateFraction: the scale preset actually prunes isotropic noise") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = all.where(col("vec_id") < 20)
    def frac(p: Int, t: Int): Double =
      Similarity.candidateFraction(all, q, "vec_id", "embedding", p, t)
        .head().getAs[Double]("fraction")
    val recallPreset = frac(4, 32)   // worst-case tuning: prune near-disabled
    val scalePreset = frac(Similarity.ScaleNPlanes, Similarity.ScaleTables)
    info(f"candidateFraction recall-preset(4x32)=$recallPreset%.4f " +
      f"scale-preset(${Similarity.ScaleNPlanes}x${Similarity.ScaleTables})=$scalePreset%.4f")
    assert(scalePreset < 0.05,
      s"scale preset admits $scalePreset of all pairs — not pruning")
    assert(scalePreset < recallPreset / 10,
      s"scale preset ($scalePreset) should prune >=10x harder than the " +
        s"recall preset ($recallPreset)")
  }

  test("cosineNearDups scale preset: exact sims; its dup pairs nest in the recall preset's") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("sim")).toMap
    // threshold -1.0 = every verified candidate (what the registered
    // llm_cosine_neardup_scale query emits)
    val scale = pairs(Similarity.cosineNearDups(all, "vec_id", "embedding",
      threshold = -1.0, nPlanes = Similarity.ScaleNPlanes,
      tables = Similarity.ScaleTables))
    val recall = pairs(Similarity.cosineNearDups(all, "vec_id", "embedding",
      threshold = 0.35))
    info(s"scale-preset candidates=${scale.size}, recall-preset dups=${recall.size}")
    assert(scale.nonEmpty, "scale preset should still admit some candidates")
    val scaleDups = scale.filter(_._2 >= 0.35)
    scaleDups.foreach { case (pair, sim) =>
      assert(recall.contains(pair),
        s"scale-preset dup $pair missing from the near-full recall preset")
      assert(recall(pair) === sim, s"verified sim differs for $pair")
    }
  }

  test("quantize: codes bounded, error within one quantization step, zero vector safe") {
    val s = spark; import s.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val audited = Quantize.stats(real, "vec_id", "embedding").collect()
    audited.foreach { r =>
      val mx = r.getAs[Double]("max_abs")
      val err = r.getAs[Double]("max_err")
      assert(err <= mx / 127.0 + 1e-12,
        s"vec ${r.get(0)}: err $err exceeds one step ${mx / 127.0}")
    }
    val codes = real.select(Quantize.int8Codes(col("embedding")).as("q"))
      .select(explode(col("q")).as("c")).agg(min("c"), max("c")).head()
    assert(codes.getLong(0) >= -128 && codes.getLong(1) <= 127)
    val zero = Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val zr = Quantize.stats(zero, "vec_id", "embedding").head()
    assert(zr.getAs[Long]("code_sum") === 0L && zr.getAs[Double]("max_err") === 0.0)
  }

  test("cosineNearDups finds >= 90% of true pairs above threshold, with exact sims") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = all.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
    val b = all.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
    val truePairs = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("__va"), col("__vb")), 6).as("sim"))
      .where(col("sim") >= 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDups(all, "vec_id", "embedding", threshold = 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(truePairs), "LSH pairs must verify exactly")
    assert(truePairs.nonEmpty)
    val recall = lsh.size.toDouble / truePairs.size
    assert(recall >= 0.9, s"near-dup recall $recall < 0.9 (${lsh.size}/${truePairs.size})")
  }

  test("exactCosinePairs: correct pairs under the cap; over-cap fails loudly in-plan") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.1f)),  // ~0.995 cosine with vec 1
      (3L, Array(0.0f, 1.0f))   // orthogonal to vec 1
    ).toDF("vec_id", "embedding")
    val got = Similarity.exactCosinePairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
    // the guard is lazy: plan construction launches no job and throws
    // nothing; the failure surfaces at EXECUTION with a clear message
    val guarded = Similarity.exactCosinePairs(vecs, "vec_id", "embedding", 0.9,
      maxVectors = 2)
    val e = intercept[Exception] { guarded.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("all-pairs check harness")),
      s"expected the harness-cap error, got: ${messages(e).mkString(" | ")}")
  }
}
