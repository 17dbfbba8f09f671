package graft.sink

import graft.cdc.CdcNormalize

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-amplification microbench: small batches against a large
  * pre-seeded table, timed per sink layout. The full streaming harness
  * cannot see this difference locally — its per-trigger fixed cost
  * (JSON normalize, fan-out, foreachBatch scheduling) is ~2 s, an order
  * above any sink's write at test scale — so the sinks are timed
  * directly: same seed, same batches, only the layout differs.
  *
  *  - COW ([[KeyedUpsertTable]]): every commit rewrites the whole table
  *    — cost O(table), the reference's own choice at small scale.
  *  - Bucketed ([[BucketedUpsertTable]]): rewrites touched buckets; a
  *    hash-spread 1k-key batch touches ~every bucket, so at THIS batch
  *    shape it degenerates to ~COW (its regime is batch keys ≪ buckets).
  *  - MOR ([[MorUpsertTable]]): appends O(batch) delta files; inline
  *    compaction (included in the timing) amortizes the rewrite over
  *    `compactAfter` commits.
  */
object SinkBench {

  final case class Result(cowSec: Double, bucketedSec: Double, morSec: Double,
                          tableRows: Long, batchRows: Int, commits: Int)

  def run(spark: SparkSession, tableRows: Long = 4000000L,
          batchRows: Int = 1000, commits: Int = 6): Result = {
    val M = CdcNormalize.MtimeCol
    val D = CdcNormalize.DeletedCol
    def rows(from: Long, n: Long, mtime: Long) =
      spark.range(from, from + n).select(
        col("id"),
        concat(lit("v"), col("id")).as("v"),
        lit(mtime).as(M),
        lit(false).as(D))
    val seed = rows(0L, tableRows, 1L)
    // new keys per commit (the growing-table regime) + a few updates
    def batch(c: Int) =
      rows(tableRows + c.toLong * batchRows, batchRows - 50L, (c + 2).toLong)
        .unionByName(rows(c.toLong * 1000L, 50L, (c + 2).toLong))
    def time(mk: String => UpsertSink): Double = {
      val root = graft.queries.CdcQueries.tempSinkDir("graft-sink-bench")
      val t = mk(root.toString)
      t.upsert(seed) // untimed: the pre-existing table
      val t0 = System.nanoTime()
      (0 until commits).foreach(c => t.upsert(batch(c)))
      (System.nanoTime() - t0) / 1e9
    }
    val cow = time(r => new KeyedUpsertTable(spark, r, Seq("id")))
    val bucketed = time(r =>
      new BucketedUpsertTable(spark, r, Seq("id"), nBuckets = 16))
    // compactAfter = 6 with 6 timed commits: exactly ONE inline
    // compaction lands inside the window (Hudi's inline default is
    // every 5 delta commits) — the rewrite is paid, not deferred.
    val mor = time(r =>
      new MorUpsertTable(spark, r, Seq("id"), nBuckets = 16, compactAfter = 6))
    Result(cow, bucketed, mor, tableRows, batchRows, commits)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val r = run(spark)
    println(f"[sink-bench] table=${r.tableRows} batch=${r.batchRows} commits=${r.commits} " +
      f"cow=${r.cowSec}%.2fs bucketed=${r.bucketedSec}%.2fs mor=${r.morSec}%.2fs " +
      f"mor_speedup=${r.cowSec / r.morSec}%.1fx")
    spark.stop()
  }
}
