package graft.ext

import graft.util.StagedSwap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental content-defined-chunk dedup against a PERSISTED chunk
  * store — the backup-style ingest form of [[GearChunk]]: "how many of
  * the arriving blobs' bytes are already stored?" without re-chunking
  * the existing corpus. This is the dedup accounting an object-store
  * ingest of crawled media runs on every batch: chunks whose digest is
  * already in the store cost nothing; only new-digest chunks are
  * written.
  *
  * Index layout (the epoch discipline of [[IncrementalLineDedup]]):
  * `chunks/__epoch=<e>/` rows (chunk_sha256, chunk_bytes, refs),
  * bucket-partitioned by `pmod(xxhash64(chunk_sha256), buckets)` so an
  * arriving batch prunes the store scan to the buckets its own digests
  * occupy; `meta/` pins (mask_bits, min_size, max_size, buckets) so
  * every epoch chunks with identical boundaries (mixing parameters
  * would make equal bytes produce different digests). All directory
  * mutations ride the crash-safe [[StagedSwap]] seam.
  *
  * Contract (`mm_cdc_incremental_check` proves it): a batch chunk is
  * DUP iff its digest exists in the store; within-batch repeats are
  * NOT collapsed (two new blobs sharing a chunk both count it new) —
  * the store-side view of "bytes this batch adds" folds them at
  * [[appendToIndex]] time, where digests aggregate per epoch.
  *
  * Scale shape: batch blobs are chunked in ONE map-side pass (blobs
  * never shuffle); only digests cross the wire. The store scan is
  * bucket-partition-pruned (bounded planning collect of ≤ `buckets`
  * ints) and semi-joined against the batch's broadcast digest set, so
  * the work is O(|batch| + store-rows-in-touched-buckets), never
  * O(|corpus|).
  */
object IncrementalGearChunk {

  private val BucketCol = "__cb"

  private def bucket(c: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  private def swapFor(spark: SparkSession, path: String) =
    new StagedSwap(spark, path, sentinel = "meta", others = Seq("chunks"))

  /** Build the store at `path` from the existing corpus. */
  def writeIndex(blobs: DataFrame, idCol: String, blobCol: String,
                 path: String, maskBits: Int = 6, minSize: Int = 16,
                 maxSize: Int = 256, buckets: Int = 16): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = blobs.sparkSession
    writeEpoch(blobs, idCol, blobCol, path, "base",
      maskBits, minSize, maxSize, buckets)
    import spark.implicits._
    Seq((maskBits, minSize, maxSize, buckets))
      .toDF("mask_bits", "min_size", "max_size", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Fold a batch's chunk digests in under the named epoch — O(batch)
    * writes, idempotent per epoch (replay overwrites its own dirs). */
  def appendToIndex(newBlobs: DataFrame, idCol: String, blobCol: String,
                    path: String, epoch: String): Unit = {
    require(epoch.nonEmpty && epoch != "base" && !epoch.contains('/'),
      s"epoch must be a non-'base', path-safe name, got '$epoch'")
    val spark = newBlobs.sparkSession
    swapFor(spark, path).recover()
    val m = spark.read.parquet(s"$path/meta").head()
    writeEpoch(newBlobs, idCol, blobCol, path, epoch,
      m.getAs[Int]("mask_bits"), m.getAs[Int]("min_size"),
      m.getAs[Int]("max_size"), m.getAs[Int]("buckets"))
  }

  private def writeEpoch(blobs: DataFrame, idCol: String, blobCol: String,
                         path: String, epoch: String, maskBits: Int,
                         minSize: Int, maxSize: Int, buckets: Int): Unit =
    GearChunk.chunks(blobs, idCol, blobCol, maskBits, minSize, maxSize)
      .groupBy("chunk_sha256")
      .agg(max("chunk_bytes").as("chunk_bytes"), count(lit(1)).as("refs"))
      .withColumn(BucketCol, bucket(col("chunk_sha256"), buckets))
      .write.mode("overwrite").partitionBy(BucketCol)
      .parquet(s"$path/chunks/__epoch=$epoch")

  /** Fold every epoch into a single `base` (refs is a monoid). */
  def compact(spark: SparkSession, path: String): Unit = {
    val swap = swapFor(spark, path)
    swap.recover()
    val meta = spark.read.parquet(s"$path/meta")
    val buckets = meta.head().getAs[Int]("buckets")
    spark.read.parquet(s"$path/chunks")
      .groupBy("chunk_sha256")
      .agg(max("chunk_bytes").as("chunk_bytes"), sum("refs").as("refs"))
      .withColumn(BucketCol, bucket(col("chunk_sha256"), buckets))
      .write.mode("overwrite").partitionBy(BucketCol)
      .parquet(s"${swap.stagedDir("chunks")}/__epoch=base")
    meta.coalesce(1).write.mode("overwrite")
      .parquet(swap.stagedDir("meta"))
    swap.swap()
  }

  /** Per-blob dedup accounting for the arriving batch against the
    * store: (id, n_chunks, n_dup_chunks, blob_bytes, dup_bytes,
    * new_bytes). `excludeEpochs` is the streaming replay seam.
    *
    * The gear+SHA-256 kernel — the dominant CPU cost — runs ONCE: the
    * chunk table is cached for the duration of the call (its three
    * consumers: bucket collect, broadcast digest build, final probe)
    * and the small per-blob result is staged through the
    * [[graft.util.Checkpoints]] seam before the cache drops, so the
    * returned frame never replays the kernel. */
  def newBytes(spark: SparkSession, path: String, newBlobs: DataFrame,
               idCol: String, blobCol: String,
               excludeEpochs: Seq[String] = Nil): DataFrame = {
    swapFor(spark, path).recover()
    val m = spark.read.parquet(s"$path/meta").head()
    val buckets = m.getAs[Int]("buckets")

    val batch = GearChunk.chunks(newBlobs, idCol, blobCol,
        m.getAs[Int]("mask_bits"), m.getAs[Int]("min_size"),
        m.getAs[Int]("max_size"))
      .persist()
    try {
      val batchDigests = batch.select("chunk_sha256").distinct()

      val idx0 = spark.read.parquet(s"$path/chunks")
      val idx1 =
        if (excludeEpochs.isEmpty) idx0
        else idx0.where(!col("__epoch").isin(excludeEpochs: _*))
      // bounded planning collect: ≤ `buckets` ints prune the store scan
      // (also materializes the chunk cache for the two reads below)
      val bs = batchDigests
        .select(bucket(col("chunk_sha256"), buckets).as(BucketCol))
        .distinct().collect().map(_.getInt(0)).toSeq
      val stored = idx1.where(col(BucketCol).isin(bs: _*))
        .join(broadcast(batchDigests), Seq("chunk_sha256"), "left_semi")
        .select(col("chunk_sha256")).distinct()
        .withColumn("__dup", lit(true))

      graft.util.Checkpoints.stage(
        batch.join(broadcast(stored), Seq("chunk_sha256"), "left")
          .groupBy(col(idCol))
          .agg(
            count(lit(1)).as("n_chunks"),
            count(when(col("__dup"), 1)).as("n_dup_chunks"),
            sum("chunk_bytes").as("blob_bytes"),
            coalesce(sum(when(col("__dup"), col("chunk_bytes"))), lit(0L))
              .as("dup_bytes"),
            coalesce(sum(when(col("__dup").isNull, col("chunk_bytes"))), lit(0L))
              .as("new_bytes")))
    } finally { batch.unpersist(); () }
  }
}
