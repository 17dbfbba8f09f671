package graft

import graft.ext.Dedup

import org.apache.spark.sql.functions._

/** The ladder's exponents are only meaningful if the generated factor-F
  * data is F× the SAME workload: replicas must preserve within-replica
  * dup/shingle structure exactly and create no cross-replica near-dup
  * pairs (which would inflate pair counts quadratically and fake a
  * superlinear exponent on a correct plan). */
class ScaleLadderSpec extends SparkSpecBase {

  private val base = "/root/testdata/sf0.001"

  test("a deadline that expires during 1x generation skips EVERY rung group, disclosed") {
    // deadline 0 = already past when the early-return check runs; the
    // artifact must then carry a disclosed SKIPPED row for every rung
    // group the ladder can produce — none may silently vanish
    val rungs = ScaleLadder.run(spark, base, 2,
      deadlineSecOverride = Some(0.0))
    assert(rungs.map(_.name).sorted === ScaleLadder.allRungNames.sorted)
    assert(rungs.forall(r => r.t1 == -1.0 && r.tF == -1.0 &&
      r.exponent.isNaN && r.note.contains("SKIPPED")))
    // the disclosure names the deadline that ACTUALLY expired (the
    // override), not the env default
    assert(rungs.forall(_.note.contains("(0.0s)")))
    // the inventory itself stays sane: unique names, 3pt twins present
    assert(ScaleLadder.allRungNames.distinct.size ===
      ScaleLadder.allRungNames.size)
    assert(ScaleLadder.allRungNames.count(_.endsWith("_3pt")) >= 2)
  }

  test("factor-2 documents: pair structure exactly doubles, no cross-replica pairs") {
    val out = java.nio.file.Files.createTempDirectory("ladder-spec").toString
    ScaleLadder.generate(spark, base, out, factor = 2)
    val baseDocs = spark.read.parquet(s"$base/documents.parquet")
    val scaled = spark.read.parquet(s"$out/documents.parquet")
    assert(scaled.count() === 2 * baseDocs.count())
    val basePairs = Dedup.jaccardPairs(baseDocs, "doc_id", "text",
      n = 3, threshold = 0.12, maxDf = 50L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val scaledPairs = Dedup.jaccardPairs(scaled, "doc_id", "text",
      n = 3, threshold = 0.12, maxDf = 50L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair stays within one replica …
    val S = ScaleLadder.Stride
    assert(scaledPairs.forall { case (a, b) => a / S === b / S },
      "cross-replica near-dup pairs exist — rotation failed to decorrelate")
    // … and each replica reproduces the base pair set exactly
    val replica0 = scaledPairs.filter(_._1 < S)
    val replica1 = scaledPairs.filter(_._1 >= S)
      .map { case (a, b) => (a - S, b - S) }
    assert(replica0 === basePairs)
    assert(replica1 === basePairs)
  }

  test("factor-2 embeddings: norms preserved per replica, ids disjoint") {
    val out = java.nio.file.Files.createTempDirectory("ladder-spec-emb").toString
    ScaleLadder.generate(spark, base, out, factor = 2)
    val baseEmb = spark.read.parquet(s"$base/embeddings.parquet")
    val scaled = spark.read.parquet(s"$out/embeddings.parquet")
    assert(scaled.count() === 2 * baseEmb.count())
    def normSum(df: org.apache.spark.sql.DataFrame) =
      df.select(sum(aggregate(col("embedding").cast("array<double>"),
        lit(0.0), (a, x) => a + x * x))).head().getDouble(0)
    // rotation permutes components → per-replica norm mass identical
    val S = ScaleLadder.Stride
    assert(math.abs(normSum(scaled.where(col("vec_id") < S)) - normSum(baseEmb)) < 1e-6)
    assert(math.abs(normSum(scaled.where(col("vec_id") >= S)) - normSum(baseEmb)) < 1e-6)
  }

  test("index-size rungs separate docs-scaling from tokens-scaling") {
    val rungs = ScaleLadder.indexSizeRungs(spark, base)
    val byName = rungs.map(r => r.name -> r).toMap
    val mh = byName("llm_minhash_index_bytes")
    val ex = byName("llm_dedup_index_bytes")
    // signature index: fixed rows per doc → size ∝ docs (exponent → 1)
    assert(mh.exponent > 0.7, s"minhash index exponent ${mh.exponent}")
    // exact postings+df: size ∝ tokens → barely moves when docs shrink
    // at constant tokens (exponent → 0)
    assert(ex.exponent < 0.35, s"exact index exponent ${ex.exponent}")
    assert(mh.t1 > 0 && mh.tF > 0 && ex.t1 > 0 && ex.tF > 0)
    // and the twin is materially smaller than the exact index it replaces
    assert(mh.t1 < ex.t1,
      s"signature index (${mh.t1} B) not smaller than exact (${ex.t1} B)")
  }

  test("rotVec is modular: replica index beyond the embedding dimension is safe") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    // k = 7 on a 3-dim vector: 7 % 3 = 1 → rotate by one, no negative slice
    val got = df.select(ScaleLadder.rotVec(7).as("e"))
      .head().getSeq[Float](0)
    assert(got === Seq(2.0f, 3.0f, 1.0f))
    // k a multiple of the dimension → identity
    val same = df.select(ScaleLadder.rotVec(6).as("e"))
      .head().getSeq[Float](0)
    assert(same === Seq(1.0f, 2.0f, 3.0f))
  }

  test("digit-only tokens decorrelate across replicas") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "409 515 62 77 88 99 100")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", lit(10))
    val out = java.nio.file.Files.createTempDirectory("ladder-dig").toString
    docs.write.parquet(s"$out/in/documents.parquet")
    spark.read.parquet(s"$base/embeddings.parquet")
      .write.parquet(s"$out/in/embeddings.parquet")
    spark.read.parquet(s"$base/events.parquet")
      .write.parquet(s"$out/in/events.parquet")
    ScaleLadder.generate(spark, s"$out/in", s"$out/gen", factor = 2)
    val texts = spark.read.parquet(s"$out/gen/documents.parquet")
      .orderBy("doc_id").select("text").collect().map(_.getString(0))
    assert(texts.length === 2)
    assert(texts(0) !== texts(1), "replica 1's numeric text must differ from replica 0's")
  }
}
