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
}
