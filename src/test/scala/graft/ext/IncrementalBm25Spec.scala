package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalBm25Spec extends SparkSpecBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val real = "/root/testdata/sf0.001/documents.parquet"
  private val Q = graft.queries.LlmQueries.Bm25QueryTerms

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] = {
    val s = spark; import s.implicits._
    df.select("doc_id", "n_terms", "score_u", "rank")
      .as[(Long, Long, Long, Long)].orderBy("rank").collect.toSeq
  }

  test("index build + shard fold == direct full-corpus topK (real corpus)") {
    val all = spark.read.parquet(real)
    val dir = tmp("bm25-idx")
    IncrementalBm25.writeIndex(all.where(col("doc_id") % 10 =!= 0),
      "doc_id", "text", dir, termBuckets = 16)
    IncrementalBm25.appendToIndex(all.where(col("doc_id") % 10 === 0),
      "doc_id", "text", dir, epoch = "shard0")
    val served = rows(IncrementalBm25.search(spark, dir, Q, k = 25))
    val direct = rows(Bm25.topK(all, "doc_id", "text", Q, k = 25))
    assert(served === direct)
  }

  test("excludeEpochs serves the pre-shard corpus; replay is idempotent") {
    val all = spark.read.parquet(real)
    val base = all.where(col("doc_id") % 10 =!= 0)
    val shard = all.where(col("doc_id") % 10 === 0)
    val dir = tmp("bm25-idx2")
    IncrementalBm25.writeIndex(base, "doc_id", "text", dir, termBuckets = 16)
    IncrementalBm25.appendToIndex(shard, "doc_id", "text", dir, "shard0")
    // a replayed batch overwrites its own epoch — no double counting
    IncrementalBm25.appendToIndex(shard, "doc_id", "text", dir, "shard0")
    assert(rows(IncrementalBm25.search(spark, dir, Q, 25)) ===
      rows(Bm25.topK(all, "doc_id", "text", Q, 25)))
    // the streaming replay seam: excluding the shard = base-only corpus
    assert(rows(IncrementalBm25.search(spark, dir, Q, 25,
        excludeEpochs = Seq("shard0"))) ===
      rows(Bm25.topK(base, "doc_id", "text", Q, 25)))
  }

  test("compact folds epochs to base and changes no result") {
    val all = spark.read.parquet(real)
    val dir = tmp("bm25-idx3")
    IncrementalBm25.writeIndex(all.where(col("doc_id") % 10 =!= 0),
      "doc_id", "text", dir, termBuckets = 16)
    IncrementalBm25.appendToIndex(all.where(col("doc_id") % 10 === 0),
      "doc_id", "text", dir, "shard0")
    val before = rows(IncrementalBm25.search(spark, dir, Q, 25))
    IncrementalBm25.compact(spark, dir)
    assert(rows(IncrementalBm25.search(spark, dir, Q, 25)) === before)
    val epochs = spark.read.parquet(s"$dir/postings")
      .select("__epoch").distinct().collect().map(_.getString(0)).toSeq
    assert(epochs === Seq("base"))
    assert(spark.read.parquet(s"$dir/stats").count() === 1L)
  }

  test("probe is partition-pruned to the query terms' buckets") {
    val all = spark.read.parquet(real)
    val dir = tmp("bm25-idx4")
    IncrementalBm25.writeIndex(all, "doc_id", "text", dir, termBuckets = 16)
    val plan = IncrementalBm25.search(spark, dir, Q, 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__tb"),
      s"postings scan must carry a __tb partition filter:\n$plan")
  }

  test("unbucketed layout (termBuckets = 0) serves identically") {
    val all = spark.read.parquet(real)
    val dir = tmp("bm25-idx5")
    IncrementalBm25.writeIndex(all, "doc_id", "text", dir, termBuckets = 0)
    assert(rows(IncrementalBm25.search(spark, dir, Q, 25)) ===
      rows(Bm25.topK(all, "doc_id", "text", Q, 25)))
  }
}
