package graft.ext

import graft.SparkSpecBase
import graft.functions.PqKernels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ: deterministic training, save/load round trip, encode/LUT/ADC
  * kernel correctness (interpreted ≡ codegen ≡ driver-side recompute),
  * and the search pipeline's exact-rerank contract on a clustered
  * corpus. */
class PqSpec extends SparkSpecBase {

  // 4 tight clusters along distinct axes in 16 dims; 32 vectors each.
  private def clustered(): DataFrame = {
    val s = spark; import s.implicits._
    (0 until 128).map { i =>
      val axis = i % 4
      val v = Array.tabulate(16)(d =>
        if (d == axis * 4) 1.0 else 0.001 * ((i * 7 + d) % 5))
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("training is deterministic and save/load round-trips bit-identically") {
    val df = clustered()
    val m1 = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8)
    val m2 = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8)
    assert(m1.codebooks.flatten.flatten.toSeq === m2.codebooks.flatten.flatten.toSeq)
    val dir = java.nio.file.Files.createTempDirectory("pq-model").toString
    Pq.save(spark, m1, dir)
    val m3 = Pq.load(spark, dir)
    assert(m3.m === 4 && m3.ksub === 8 && m3.subDim === 4)
    assert(m1.codebooks.flatten.flatten.toSeq === m3.codebooks.flatten.flatten.toSeq)
  }

  test("encode/LUT/ADC kernels: ADC score equals the driver-side recompute") {
    val df = clustered()
    val model = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8)
    val rows = df.select(
        col("vec_id"),
        graft.functions.PqExpressions.encode(
          col("embedding").cast("array<double>"), model).as("codes"),
        graft.functions.PqExpressions.lut(
          col("embedding").cast("array<double>"), model).as("lut"))
      .collect()
    assert(rows.forall(_.getAs[Array[Byte]]("codes").length === 4))
    // self-ADC: score of a vector against its own LUT must equal the
    // kernel recompute, and sit near 1 (unit self-cosine) for tight codes
    val flat = {
      val out = new Array[Double](model.m * model.ksub * model.subDim)
      for (j <- 0 until model.m; c <- 0 until model.ksub)
        System.arraycopy(model.codebooks(j)(c), 0, out,
          (j * model.ksub + c) * model.subDim, model.subDim)
      out
    }
    val vecs = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      val lut = r.getSeq[Double](2).toArray
      val viaDf = PqKernels.adc(codes, lut, model.ksub)
      val u = PqKernels.unitOrNull(vecs(r.getLong(0)), 16)
      val expCodes = PqKernels.encode(u, flat, model.m, model.ksub, model.subDim)
      assert(codes.toSeq === expCodes.toSeq)
      val expLut = PqKernels.lut(u, flat, model.m, model.ksub, model.subDim)
      assert(lut.toSeq === expLut.toSeq)
      assert(viaDf > 0.8, s"self-ADC unexpectedly low: $viaDf")
    }
  }

  test("null semantics: zero vector and wrong length encode to null") {
    val s = spark; import s.implicits._
    val model = Pq.train(clustered(), "vec_id", "embedding", m = 4, ksub = 8)
    val bad = Seq(
      (1L, Array.fill(16)(0.0)),     // zero vector
      (2L, Array.fill(8)(1.0)),      // wrong dim
      (3L, Array.tabulate(16)(_.toDouble)) // fine
    ).toDF("vec_id", "embedding")
    val out = bad.select(col("vec_id"), graft.functions.PqExpressions.encode(
        col("embedding").cast("array<double>"), model).as("codes"))
      .orderBy("vec_id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && !out(2).isNullAt(1))
  }

  test("indexed search: exact-rerank top-k ⊆ exact; clustered recall = 1") {
    val df = clustered()
    val queries = df.where(col("vec_id") < 4) // one per cluster
    val ivf = Ivf.train(df, "vec_id", "embedding", nCells = 4)
    val pq = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq-idx").toString
    Pq.writeIndex(df, "vec_id", "embedding", ivf, pq, s"$dir/idx")
    val got = Pq.topKIndexed(spark, s"$dir/idx", queries, "vec_id",
      "embedding", k = 5, nProbe = 2, rerank = 20)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding",
      k = 5)
    val g = got.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = exact.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g === e, s"missed: ${e -- g}; spurious: ${g -- e}")
    // reported sims are EXACT cosines (the rerank contract): every
    // (query, neighbor, sim) matches the brute-force row
    val gs = got.select("query_id", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val es = exact.select("query_id", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gs === es)
  }

  test("plan: ADC stage scans codes without the float column; cells pruned") {
    val df = clustered()
    val queries = df.where(col("vec_id") < 4)
    val ivf = Ivf.train(df, "vec_id", "embedding", nCells = 4)
    val pq = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq-plan").toString
    Pq.writeIndex(df, "vec_id", "embedding", ivf, pq, s"$dir/idx")
    val plan = Pq.topKIndexed(spark, s"$dir/idx", queries, "vec_id",
        "embedding", k = 5, nProbe = 2, rerank = 20)
      .queryExecution.executedPlan.toString
    // two scans over the index data: the ADC scan must project codes
    // WITHOUT the embedding floats (the IO story PQ exists for); the
    // rerank scan fetches embedding. Both carry the cell partition
    // filter from the probe set.
    val scans = plan.split("\n").filter(l =>
      l.contains("ReadSchema") || l.contains("PartitionFilters"))
    assert(plan.contains("codes"))
    val readSchemas = scans.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.exists(l => l.contains("codes") && !l.contains("embedding")),
      s"no codes-only scan found:\n${readSchemas.mkString("\n")}")
    assert(readSchemas.exists(_.contains("embedding")),
      "rerank scan with the float column missing")
    val partFilters = scans.filter(_.contains("PartitionFilters")).toSeq
    assert(partFilters.exists(_.contains("cell")),
      s"cell partition pruning missing:\n${partFilters.mkString("\n")}")
  }

  test("appendToIndex: searches after an epoch append equal a from-scratch index") {
    val all = clustered()
    val first = all.where(col("vec_id") % 3 =!= 0)
    val batch = all.where(col("vec_id") % 3 === 0)
    val q = all.where(col("vec_id") < 3)
    val ivf = Ivf.train(all, "vec_id", "embedding", nCells = 4)
    val pq = Pq.train(all, "vec_id", "embedding", m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq-append").toString
    Pq.writeIndex(first, "vec_id", "embedding", ivf, pq, s"$dir/grown")
    Pq.appendToIndex(batch, "vec_id", "embedding", s"$dir/grown", "b1")
    Pq.writeIndex(all, "vec_id", "embedding", ivf, pq, s"$dir/whole")
    def run(p: String) = Pq.topKIndexed(spark, p, q, "vec_id", "embedding",
        k = 5, nProbe = 2, rerank = 20)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(run(s"$dir/grown") === run(s"$dir/whole"))
    // idempotent replay: re-appending the same epoch changes nothing
    Pq.appendToIndex(batch, "vec_id", "embedding", s"$dir/grown", "b1")
    assert(run(s"$dir/grown") === run(s"$dir/whole"))
  }

  test("residual (IVFADC) mode: exact-rerank equality, stored-mode append parity") {
    val df = clustered()
    val queries = df.where(col("vec_id") < 4)
    val ivf = Ivf.train(df, "vec_id", "embedding", nCells = 4)
    val pq = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8,
      residualOf = Some(ivf))
    val dir = java.nio.file.Files.createTempDirectory("pq-res").toString
    Pq.writeIndex(df, "vec_id", "embedding", ivf, pq, s"$dir/idx",
      residual = true)
    val got = Pq.topKIndexed(spark, s"$dir/idx", queries, "vec_id",
        "embedding", k = 5, nProbe = 2, rerank = 20)
      .select("query_id", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exact, s"missed: ${exact -- got}; spurious: ${got -- exact}")

    // appendToIndex must resolve residual mode FROM STORAGE: a grown
    // index equals a from-scratch one, and replay is idempotent
    val first = df.where(col("vec_id") % 3 =!= 0)
    val batch = df.where(col("vec_id") % 3 === 0)
    Pq.writeIndex(first, "vec_id", "embedding", ivf, pq, s"$dir/grown",
      residual = true)
    Pq.appendToIndex(batch, "vec_id", "embedding", s"$dir/grown", "b1")
    Pq.appendToIndex(batch, "vec_id", "embedding", s"$dir/grown", "b1")
    def run(p: String) = Pq.topKIndexed(spark, p, queries, "vec_id",
        "embedding", k = 5, nProbe = 2, rerank = 20)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(run(s"$dir/grown") === run(s"$dir/idx"))
  }

  test("residual codes beat raw-position codes on ADC rank (before rerank)") {
    // isotropic-ish corpus where raw-position PQ at a tiny code budget
    // visibly misranks: compare how many exact top-k pairs survive to
    // the ADC shortlist under each encoding at rerank = k (no slack).
    val s = spark; import s.implicits._
    val df = (0 until 256).map { i =>
      val v = Array.tabulate(16)(d =>
        math.sin(i * 2.39996 + d * 1.7) + 0.3 * math.cos(i * 0.77 * (d + 1)))
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 8)
    val ivf = Ivf.train(df, "vec_id", "embedding", nCells = 4)
    val raw = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8)
    val res = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8,
      residualOf = Some(ivf))
    val dir = java.nio.file.Files.createTempDirectory("pq-ab").toString
    Pq.writeIndex(df, "vec_id", "embedding", ivf, raw, s"$dir/raw")
    Pq.writeIndex(df, "vec_id", "embedding", ivf, res, s"$dir/res",
      residual = true)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(p: String): Int =
      Pq.topKIndexed(spark, p, queries, "vec_id", "embedding",
          k = 5, nProbe = 4, rerank = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(exact).size
    val (rawHits, resHits) = (hits(s"$dir/raw"), hits(s"$dir/res"))
    assert(resHits >= rawHits,
      s"residual ADC ($resHits) must not rank worse than raw ($rawHits)")
    assert(resHits > rawHits,
      s"fixture expected to discriminate: raw=$rawHits res=$resHits of ${exact.size}")
  }

  test("codes are m bytes: 8x smaller than the float vectors they index") {
    val df = clustered()
    val ivf = Ivf.train(df, "vec_id", "embedding", nCells = 4)
    val pq = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq-sz").toString
    Pq.writeIndex(df, "vec_id", "embedding", ivf, pq, s"$dir/idx")
    val data = spark.read.parquet(s"$dir/idx/data")
    val sizes = data.select(
        length(col("codes")).as("code_bytes"),
        (size(col("embedding")) * 8).as("vec_bytes"))
      .agg(max("code_bytes"), min("code_bytes"), max("vec_bytes")).head()
    assert(sizes.getInt(0) === 4 && sizes.getInt(1) === 4)
    assert(sizes.getInt(2) === 128) // 16 doubles
  }
}
