package graft.stream

import graft.ext.IncrementalDedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus maintenance: each arriving micro-batch of documents
  * is checked for near-duplicates against the persisted shingle index
  * ([[IncrementalDedup]]) IN-FLIGHT, the pair report lands in an
  * append-only parquet table, and the shard is then folded into the
  * index (`appendToIndex`, an O(batch) file append) — so the NEXT shard
  * checks against a corpus that includes this one. This is the
  * streaming form of the daily ingest-dedup loop; batch semantics are
  * oracle-gated via `llm_dedup_incremental`, and the flag→append
  * sequencing here means reports are exact w.r.t. everything ingested
  * before the batch, including earlier batches of the same stream.
  *
  * Delivery: at-least-once from the checkpoint, made exactly-once for
  * the INDEX by epoch-keyed appends — each batch writes its postings
  * and df partials under `__epoch=b<batchId>`, so a replayed batch
  * overwrites its own partition dirs instead of double-counting
  * (asserted in the spec). The report parquet is epoch-keyed the same
  * way (readers see an `__epoch` partition column; a replay overwrites
  * its own rows) — and the flag pass EXCLUDES the batch's own
  * epoch from the index read (`excludeEpochs = b<batchId>`), so a
  * replay that crashed between append and checkpoint-commit still sees
  * exactly the pre-batch index: no self-pairs, no double-counted df
  * partials, byte-identical replayed report rows.
  */
object StreamNearDup {

  /** Start the flag-then-append stream. `docs` is a streaming DataFrame
    * with `idCol` and `textCol`; ids must be globally unique across the
    * stream and the pre-built index. */
  def start(docs: DataFrame, indexPath: String, outDir: String,
            checkpointDir: String, idCol: String = "doc_id",
            textCol: String = "text", threshold: Double = 0.5,
            triggerInterval: String = "1 second"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Pin the batch: the flag pass scans it several times (shingle,
        // df, size subplans) and the append scans it again.
        batch.persist()
        try {
          IncrementalDedup.nearDupPairs(spark, indexPath, batch,
              idCol, textCol, threshold,
              excludeEpochs = Seq(s"b$batchId"))
            .write.mode("overwrite").parquet(s"$outDir/__epoch=b$batchId")
          IncrementalDedup.appendToIndex(batch, idCol, textCol, indexPath,
            epoch = s"b$batchId")
        } finally { batch.unpersist(); () }
      }
      .start()
}
