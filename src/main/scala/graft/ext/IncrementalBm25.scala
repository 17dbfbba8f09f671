package graft.ext

import graft.util.StagedSwap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 retrieval against a PERSISTED postings index — the daily-ingest
  * form of [[Bm25]]: serve keyword queries over the corpus seen so far
  * without re-tokenizing it, and fold each arriving shard in as an
  * O(batch) append. The house epoch-keyed index discipline
  * ([[IncrementalLineDedup]] et al.): per-epoch partitions, idempotent
  * replays (an epoch overwrites its own partition dirs), crash-safe
  * [[StagedSwap]] compaction, and the single-ingest contract (a doc_id
  * belongs to exactly ONE epoch — re-ingesting under two epochs would
  * double its tf/df/length contributions).
  *
  * Layout at `path`:
  *  - `postings/__epoch=<e>/` — (term, doc_id, tf, dl), hash-bucketed by
  *    term when `termBuckets` > 0 so a query probe is partition-pruned
  *    to ≤ |Q| buckets. `dl` is DENORMALIZED onto the postings row: the
  *    serving join against a lengths table disappears, at ~8 bytes per
  *    posting (Lucene stores norms per posting list the same way).
  *  - `stats/__epoch=<e>/` — ONE row (n_docs, total_tokens) per epoch;
  *    the global (N, T) is their sum (a monoid under single-ingest).
  *  - `meta/` — (term_buckets).
  *
  * Contract (the `llm_bm25_incremental` oracle proves it): [[search]]
  * over `indexed ∪ appended` equals [[Bm25.topK]] over the union corpus
  * EXACTLY — df comes from counting probed postings, (N, T) from the
  * folded stats rows, and the scoring arithmetic is [[Bm25]]'s integer
  * kernel verbatim, so the index round-trip changes no bit.
  *
  * Scale shape: the probe reads ≤ |Q| term buckets (partition filter
  * built from a bounded planning collect of ≤ |Q| bucket ints — the
  * house discipline), df is a ≤ |Q|-row aggregate of the probe, stats
  * a one-row-per-epoch scan, and top-k is TakeOrderedAndProject.
  * Nothing scales with the corpus except the probed posting lists
  * themselves.
  */
object IncrementalBm25 {

  private val BucketCol = "__tb"

  private def bucketOf(term: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(term), lit(buckets.toLong)).cast("int")

  /** (term, doc_id, tf, dl) posting rows for a shard — one doc-keyed
    * aggregate over the word stream (map-side combine), dl riding the
    * stream like [[Bm25.scores]]. */
  private def postingsOf(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TextStats.nWords(col(textCol)).cast("long").as("dl"),
      TextStats.words(lower(col(textCol))).as("__w"))
    base.select(col("doc_id"), col("dl"), explode(col("__w")).as("term"))
      .where(col("term") =!= "")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      .select("term", "doc_id", "tf", "dl")
  }

  private def statsOf(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(TextStats.nWords(col(textCol)).cast("long")).as("total_tokens"))

  private def writeEpoch(docs: DataFrame, idCol: String, textCol: String,
                         path: String, epoch: String, buckets: Int): Unit = {
    val p = postingsOf(docs, idCol, textCol)
    // cluster by bucket before the partitionBy write (guide §6: without
    // it every task emits a file per touched bucket dir — tasks × buckets
    // tiny files per epoch, paid back as listing/open cost on every probe)
    val wtr =
      (if (buckets <= 0) p
       else p.withColumn(BucketCol, bucketOf(col("term"), buckets))
        .repartition(col(BucketCol)))
        .write.mode("overwrite")
    (if (buckets <= 0) wtr else wtr.partitionBy(BucketCol))
      .parquet(s"$path/postings/__epoch=$epoch")
    statsOf(docs, textCol).coalesce(1).write.mode("overwrite")
      .parquet(s"$path/stats/__epoch=$epoch")
  }

  private def swapFor(spark: SparkSession, path: String) =
    new StagedSwap(spark, path, sentinel = "meta",
      others = Seq("postings", "stats"))

  /** Build the index from the base corpus. */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 path: String, termBuckets: Int = 0): Unit = {
    val spark = docs.sparkSession
    writeEpoch(docs, idCol, textCol, path, "base", termBuckets)
    import spark.implicits._
    Seq(termBuckets).toDF("term_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Fold a shard in under the named epoch — O(batch) writes,
    * idempotent per epoch. */
  def appendToIndex(newDocs: DataFrame, idCol: String, textCol: String,
                    path: String, epoch: String): Unit = {
    require(epoch.nonEmpty && epoch != "base" && !epoch.contains('/'),
      s"epoch must be a non-'base', path-safe name, got '$epoch'")
    val spark = newDocs.sparkSession
    swapFor(spark, path).recover()
    val buckets = spark.read.parquet(s"$path/meta")
      .head().getAs[Int]("term_buckets")
    writeEpoch(newDocs, idCol, textCol, path, epoch, buckets)
  }

  /** Fold every epoch into a single `base` — postings need no
    * re-aggregation (single-ingest: a (term, doc) pair exists in exactly
    * one epoch), stats fold to one row; crash-safe staged swap. */
  def compact(spark: SparkSession, path: String): Unit = {
    val swap = swapFor(spark, path)
    swap.recover()
    val meta = spark.read.parquet(s"$path/meta")
    val buckets = meta.head().getAs[Int]("term_buckets")
    val folded = spark.read.parquet(s"$path/postings")
      .select("term", "doc_id", "tf", "dl")
    val wtr =
      (if (buckets <= 0) folded
       else folded.withColumn(BucketCol, bucketOf(col("term"), buckets)))
        .write.mode("overwrite")
    (if (buckets <= 0) wtr else wtr.partitionBy(BucketCol))
      .parquet(s"${swap.stagedDir("postings")}/__epoch=base")
    spark.read.parquet(s"$path/stats")
      .agg(sum("n_docs").as("n_docs"),
        sum("total_tokens").as("total_tokens"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${swap.stagedDir("stats")}/__epoch=base")
    meta.coalesce(1).write.mode("overwrite")
      .parquet(swap.stagedDir("meta"))
    swap.swap()
  }

  /** Top-k BM25 over the indexed corpus: [[Bm25]]'s integer kernel
    * against probed postings. `excludeEpochs` is the streaming replay
    * seam. */
  def search(spark: SparkSession, path: String, queryTerms: Seq[String],
             k: Int, excludeEpochs: Seq[String] = Nil): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1, "need query terms and positive k")
    swapFor(spark, path).recover()
    val buckets = spark.read.parquet(s"$path/meta")
      .head().getAs[Int]("term_buckets")

    val idx0 = spark.read.parquet(s"$path/postings")
    val idx1 =
      if (excludeEpochs.isEmpty) idx0
      else idx0.where(!col("__epoch").isin(excludeEpochs: _*))
    val probed0 =
      if (buckets <= 0) idx1
      else {
        // bounded planning collect: ≤ |Q| ints, computed through the
        // SAME Spark expression that bucketed the writes
        import spark.implicits._
        val qb = queryTerms.toDF("term")
          .select(bucketOf(col("term"), buckets).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        idx1.where(col(BucketCol).isin(qb: _*))
      }
    val probed = probed0.where(col("term").isin(queryTerms: _*))
      .select("term", "doc_id", "tf", "dl")

    val stats0 = spark.read.parquet(s"$path/stats")
    val stats1 =
      if (excludeEpochs.isEmpty) stats0
      else stats0.where(!col("__epoch").isin(excludeEpochs: _*))
    val stats = stats1.agg(sum("n_docs").as("n_docs"),
      sum("total_tokens").as("total_tokens"))

    val dfreq = probed.groupBy("term").agg(count(lit(1)).as("df"))
    Bm25.rankTopK(Bm25.kernel(probed, "doc_id", dfreq, stats), "doc_id", k)
  }
}
