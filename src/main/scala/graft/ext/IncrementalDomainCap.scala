package graft.ext

import graft.util.StagedSwap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental per-domain admission control against a PERSISTED
  * kept-count index — the rolling-crawl form of
  * [[UrlOps.capPerDomain]]: "which documents of the NEW shard may
  * still enter, given what each domain already contributed?" without
  * rescanning the corpus. A batch pipeline caps best-first
  * (rank-by-quality, [[UrlOps.capPerDomain]]); a rolling ingest cannot
  * evict documents it already shipped downstream, so the incremental
  * semantic is FIRST-COME: a document is admitted iff its domain's
  * admitted count so far, plus its arrival rank within the shard, is
  * within the cap. That is also what FineWeb-style pipelines do when
  * they process crawls in sequence.
  *
  * Contract (the `llm_domain_cap_incremental` oracle proves it): the
  * output equals the first-come cap over `indexed ∪ shard` in
  * (epoch, id) arrival order, restricted to shard documents.
  *
  * The index stores one (domain, n_kept) row per domain per epoch —
  * DECISIONS, not raw counts, because the cap itself is the state; the
  * single-ingest contract of every epoch-keyed index here applies (a
  * document id belongs to exactly one epoch). `n_kept` is a monoid
  * under the budget arithmetic: each epoch's rows record only the
  * documents that epoch admitted, so epoch sums never exceed the cap.
  *
  * Scale shape (the "|new|, not |corpus|" guarantee): identical to
  * [[IncrementalLineDedup]] — bucket-partition-pruned index scan
  * (bounded planning collect of ≤ `buckets` ints), broadcast semi-join
  * on the shard's distinct domains, and the only window runs over the
  * shard itself (micro-batch-bounded; the persisted side needs no
  * window at all — first-come counts are `least(count, cap)`).
  */
object IncrementalDomainCap {

  private val BucketCol = "__db"

  private def bucketed(df: DataFrame, buckets: Int): (DataFrame, Seq[String]) =
    if (buckets <= 0) (df, Nil)
    else (df.withColumn(BucketCol,
      pmod(xxhash64(col("domain")), lit(buckets.toLong)).cast("int")),
      Seq(BucketCol))

  /** Build the index at `path` from the existing corpus:
    * `counts/__epoch=base/` (domain, n_kept) with first-come admission
    * in ascending `idCol` order — which per domain is just
    * `least(count, cap)`; `meta/` (cap, buckets). */
  def writeIndex(docs: DataFrame, idCol: String, domainCol: String,
                 path: String, cap: Int, buckets: Int = 0): Unit = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = docs.sparkSession
    val counts = docs.select(col(domainCol).as("domain"))
      .groupBy("domain")
      .agg(least(count(lit(1)), lit(cap.toLong)).as("n_kept"))
    val (out, pCols) = bucketed(counts, buckets)
    val wtr = out.write.mode("overwrite")
    (if (pCols.isEmpty) wtr else wtr.partitionBy(pCols: _*))
      .parquet(s"$path/counts/__epoch=base")
    import spark.implicits._
    Seq((cap, buckets)).toDF("cap", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def swapFor(spark: SparkSession, path: String) =
    new StagedSwap(spark, path, sentinel = "meta", others = Seq("counts"))

  /** Per-domain admitted counts BEFORE this shard: every epoch except
    * `excludeEpochs`, partition-pruned to the shard's domain buckets,
    * semi-joined to the shard's (broadcast) distinct domains. */
  private def priorCounts(spark: SparkSession, path: String,
                          domains: DataFrame, buckets: Int,
                          excludeEpochs: Seq[String]): DataFrame = {
    val idx0 = spark.read.parquet(s"$path/counts")
    val idx1 =
      if (excludeEpochs.isEmpty) idx0
      else idx0.where(!col("__epoch").isin(excludeEpochs: _*))
    val idxPruned =
      if (buckets <= 0) idx1
      else {
        val bs = domains
          .select(pmod(xxhash64(col("domain")), lit(buckets.toLong))
            .cast("int").as(BucketCol))
          .distinct().collect().map(_.getInt(0)).toSeq
        idx1.where(col(BucketCol).isin(bs: _*))
      }
    idxPruned
      .join(broadcast(domains), Seq("domain"), "left_semi")
      .groupBy("domain").agg(sum("n_kept").as("n_old"))
  }

  /** Admission decisions for the NEW shard: one row per shard document,
    * (id, domain, admitted 0/1), admitted iff
    * `prior_kept + rank_within_shard <= cap` under the deterministic
    * ascending-`idCol` arrival order. `excludeEpochs` is the streaming
    * replay seam (see [[graft.stream.StreamDomainCap]]). */
  def admit(spark: SparkSession, path: String, newDocs: DataFrame,
            idCol: String, domainCol: String,
            excludeEpochs: Seq[String] = Nil): DataFrame = {
    swapFor(spark, path).recover()
    val meta = spark.read.parquet(s"$path/meta").head()
    val cap = meta.getAs[Int]("cap")
    val buckets = meta.getAs[Int]("buckets")
    val shard = newDocs.select(col(idCol).as("id"), col(domainCol).as("domain"))
    val nOld = priorCounts(spark, path, shard.select("domain").distinct(),
      buckets, excludeEpochs)
    val w = Window.partitionBy(col("domain")).orderBy(col("id"))
    shard
      .join(broadcast(nOld), Seq("domain"), "left")
      .withColumn("__rk", row_number().over(w))
      .select(col("id").as(idCol), col("domain"),
        (coalesce(col("n_old"), lit(0L)) + col("__rk") <= cap)
          .cast("int").as("admitted"))
  }

  /** Fold the shard's admissions in under the named epoch — one
    * (domain, n_kept) row per domain that admitted anything, O(shard
    * domains) writes, IDEMPOTENT per epoch: the epoch's own partials
    * are excluded from the prior-count read, so a replay recomputes and
    * overwrites identical rows. */
  def appendToIndex(newDocs: DataFrame, idCol: String, domainCol: String,
                    path: String, epoch: String): Unit = {
    require(epoch.nonEmpty && epoch != "base" && !epoch.contains('/'),
      s"epoch must be a non-'base', path-safe name, got '$epoch'")
    val spark = newDocs.sparkSession
    swapFor(spark, path).recover()
    val meta = spark.read.parquet(s"$path/meta").head()
    val cap = meta.getAs[Int]("cap")
    val buckets = meta.getAs[Int]("buckets")
    val shardCounts = newDocs.select(col(domainCol).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n_batch"))
    val nOld = priorCounts(spark, path, shardCounts.select("domain"),
      buckets, excludeEpochs = Seq(epoch))
    val admittedCounts = shardCounts
      .join(broadcast(nOld), Seq("domain"), "left")
      .select(col("domain"),
        greatest(lit(0L), least(lit(cap.toLong) - coalesce(col("n_old"), lit(0L)),
          col("n_batch"))).as("n_kept"))
      .where(col("n_kept") > 0)
    val (out, pCols) = bucketed(admittedCounts, buckets)
    val wtr = out.write.mode("overwrite")
    (if (pCols.isEmpty) wtr else wtr.partitionBy(pCols: _*))
      .parquet(s"$path/counts/__epoch=$epoch")
  }

  /** Fold every epoch into a single `base` (`n_kept` sums are exact
    * under the single-ingest contract and never exceed the cap by the
    * budget arithmetic) — same crash-safe [[StagedSwap]] discipline and
    * quiescent-stream rule as [[IncrementalLineDedup.compact]]. */
  def compact(spark: SparkSession, path: String): Unit = {
    val swap = swapFor(spark, path)
    swap.recover()
    val meta = spark.read.parquet(s"$path/meta")
    val buckets = meta.head().getAs[Int]("buckets")
    val folded = spark.read.parquet(s"$path/counts")
      .groupBy("domain").agg(sum("n_kept").as("n_kept"))
    val (out, pCols) = bucketed(folded, buckets)
    val wtr = out.write.mode("overwrite")
    (if (pCols.isEmpty) wtr else wtr.partitionBy(pCols: _*))
      .parquet(s"${swap.stagedDir("counts")}/__epoch=base")
    meta.coalesce(1).write.mode("overwrite")
      .parquet(swap.stagedDir("meta"))
    swap.swap()
  }
}
