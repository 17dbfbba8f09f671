package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark-overlap decontamination: flag training documents that share
  * word n-grams with a held-out evaluation/benchmark set — the standard
  * "13-gram overlap" test-set contamination check run before every
  * large-scale training run. Extends the reference's surface (it has no
  * text operators); part of the SURVEY.md §2.8 north-star family.
  *
  * 100 TB shape: the benchmark side is tiny (eval suites are MBs even
  * when the corpus is 100 TB), so its distinct n-gram set is BROADCAST;
  * the corpus side is a map-side explode ([[Dedup.shingles]]) feeding a
  * broadcast hash join — the 100 TB corpus is never shuffled on the
  * gram. Only two narrow aggregations shuffle, both keyed on doc id:
  * per-doc gram/hit counts, whose input is already reduced map-side by
  * the broadcast join. No inverted index, no self-join, no all-pairs.
  */
object Decontamination {

  /** Per-corpus-document contamination report against `bench`:
    * (id, n_grams, n_hits, contaminated) where `n_grams` is the doc's
    * distinct word-n-gram count, `n_hits` how many of those also occur
    * anywhere in the benchmark set, and `contaminated` = n_hits > 0.
    * Docs shorter than `n` words have no grams → (0, 0, false), kept in
    * the output so the report covers the whole corpus. Grams are
    * lowercased, whitespace-split ([[TextStats.WsRun]]) — identical
    * tokenization to the Jaccard/MinHash family so one shingle
    * definition serves the whole dedup+decontam surface. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    // Distinct benchmark grams: small by construction — broadcast it.
    val benchGrams = Dedup.shingles(bench, idCol, textCol, n)
      .select("shingle").distinct()
    val corpusGrams = Dedup.shingles(corpus, idCol, textCol, n)
    val perDoc = corpusGrams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1L))),
        Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
    corpus.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Persist the benchmark gram set once (`grams/` + `meta/` with the
    * gram size) — the incremental-ingest artifact: eval suites change
    * rarely, daily shards arrive constantly, so a production pipeline
    * shingles the benchmarks ONCE and flags every incoming shard
    * against the stored set. */
  def writeIndex(bench: DataFrame, idCol: String, textCol: String,
                 path: String, n: Int = 8): Unit = {
    val spark = bench.sparkSession
    Dedup.shingles(bench, idCol, textCol, n)
      .select("shingle").distinct()
      .write.mode("overwrite").parquet(s"$path/grams")
    import spark.implicits._
    Seq(n).toDF("n").coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** [[decontaminate]] for an append batch against the index written by
    * [[writeIndex]]: identical per-doc report (the gram set is the same
    * set, just read instead of recomputed — still broadcast), cost
    * scaling with |new batch| only. */
  def flagAgainstIndex(spark: SparkSession, path: String, newDocs: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val n = spark.read.parquet(s"$path/meta").head().getAs[Int]("n")
    val benchGrams = spark.read.parquet(s"$path/grams")
    val corpusGrams = Dedup.shingles(newDocs, idCol, textCol, n)
    val perDoc = corpusGrams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1L))),
        Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
    newDocs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
