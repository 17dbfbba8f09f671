package graft.stream

import graft.sink.ZOrderLayout

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion into a z-order clustered table — the write path
  * that keeps an analytics layout queryable while data arrives: each
  * micro-batch is z-sorted under the table's STORED bucket boundaries
  * and folded in as an O(batch) epoch-keyed append
  * ([[ZOrderLayout.append]]), so manifest-pruned rectangle reads keep
  * working mid-stream, covering everything ingested so far. Every
  * `optimizeEvery` batches the table is re-clustered in place
  * ([[ZOrderLayout.optimize]]) — the streaming form of the Delta/Hudi
  * append-then-recluster loop, bounding small-file count and pruning
  * looseness at ONE recluster per N batches instead of per write.
  *
  * Delivery: at-least-once from the checkpoint, exactly-once for the
  * table by epoch-keyed overwrite (a replayed batch rewrites its own
  * `__epoch=b<batchId>` data and manifest partitions — asserted in the
  * spec). The recluster runs BEFORE the append and preserves the
  * current batch's epoch ([[ZOrderLayout.optimize]]'s
  * `preserveEpochs`): committed epochs fold exactly once
  * (re-clustering them again on replay is a content-preserving
  * rewrite), and a crashed attempt's own leftover epoch is never
  * folded — the re-append overwrites it instead. A crash in the
  * MIDDLE of the recluster's directory swap is rolled forward by the
  * layout itself ([[ZOrderLayout]]'s `recoverSwap`, run by every
  * reader entry), so the replayed batch finds a complete table.
  *
  * Boundaries: APPENDS always use the stored quantile boundaries (the
  * append contract — one key space for every file between
  * reclusters). The scheduled optimize reuses them too by default, so
  * a replayed recluster is content-stable; under key DRIFT (the
  * ingested distribution migrating away from the boundaries the table
  * was built with) equi-depth buckets skew and pruning loosens —
  * correctness is unaffected, min/max manifests are per actual file
  * content. `rederiveBoundaries = true` makes each scheduled optimize
  * re-run the quantile pass over the folded table and publish fresh
  * boundaries through the same crash-safe swap — the maintenance-
  * window repair that restores pruning after drift (asserted in the
  * spec). */
object StreamZOrder {

  /** Start ingesting `rows` (a streaming DataFrame whose schema matches
    * the table written at `tablePath`) into the clustered table. */
  def start(rows: DataFrame, tablePath: String, checkpointDir: String,
            batchFiles: Int = 8, optimizeEvery: Int = 0,
            targetFiles: Int = 64,
            rederiveBoundaries: Boolean = false,
            triggerInterval: String = "1 second"): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Recluster BEFORE the append, preserving the current epoch:
        // every batch below this id is checkpoint-committed by
        // definition, so folding them is safe; a crashed attempt of
        // THIS batch may have left its epoch on disk, and folding it
        // before the re-append below would duplicate its rows.
        if (optimizeEvery > 0 && batchId > 0 && batchId % optimizeEvery == 0)
          ZOrderLayout.optimize(batch.sparkSession, tablePath, targetFiles,
            preserveEpochs = Seq(s"b$batchId"),
            rederiveBoundaries = rederiveBoundaries)
        ZOrderLayout.append(batch, tablePath, s"b$batchId", batchFiles)
      }
      .start()
}
