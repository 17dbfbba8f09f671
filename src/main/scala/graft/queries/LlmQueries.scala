package graft.queries

import graft.ext.{Dedup, Similarity, TextStats}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline queries over `documents` / `embeddings`
  * (SURVEY.md §2.8 north star; fixtures per FIXTURES.md §B). */
object LlmQueries {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Exact dedup: survivors (min doc_id) per distinct text + copy count.
    * The engine groups on a sha256 digest (fixed-width shuffle key); the
    * output keys are the surviving ids, oracle-checkable without the
    * digest. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(docs(spark, sfDir), "doc_id", "text")
      .select(col("doc_id"), col("n_copies"))
      .orderBy("doc_id")

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join (never
    * all-pairs). Low threshold so the word-soup corpus yields pairs. */
  def nearDupJaccard(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairs(docs(spark, sfDir), "doc_id", "text", n = 3,
        threshold = 0.12)
      .orderBy("id_a", "id_b")

  /** MinHash-LSH near-dup (approximate candidates, exact verification).
    * No SQL oracle — LSH recall is probabilistic; correctness is covered
    * by the scalatest comparing it against [[nearDupJaccard]]. */
  def minhashNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashNearDups(docs(spark, sfDir), "doc_id", "text", n = 3,
        bands = 32, rows = 2, threshold = 0.12)
      .orderBy("id_a", "id_b")

  /** SimHash fingerprints (rows-only check: xxhash64 seeds are
    * Spark-specific; semantics covered by scalatest). */
  def simhashFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhash(docs(spark, sfDir), "doc_id", "text").orderBy("doc_id")

  /** Brute-force cosine top-5 for the first 20 vectors as the query set.
    * Exact baseline for ANN; double math matches DuckDB's
    * list_cosine_similarity bit-for-bit, rounded to 1e-6 defensively. */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    Similarity.bruteForceTopK(all, all.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-k (the 100 TB path; recall vs the exact
    * baseline is asserted in tests, not oracled). */
  def cosineTopKLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    Similarity.lshTopK(all, all.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  /** Per-language corpus stats: integer-exact totals. */
  def textStatsPerLang(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.perLangStats(docs(spark, sfDir))

  /** Per-document quality metrics (word/token counts, ratios). */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      TextStats.nWords(col("text")).cast("long").as("n_words"),
      TextStats.nTokens(col("text")).cast("long").as("n_tokens"),
      TextStats.stopwordRatio(col("text")).as("stopword_ratio"),
      TextStats.meanWordLen(col("text")).as("mean_word_len"))
    .orderBy("doc_id")
}
