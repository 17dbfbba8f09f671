package graft.stream

import graft.ext.IncrementalBm25

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming BM25 search-index maintenance: each arriving micro-batch
  * of documents is folded into the persisted postings index
  * ([[IncrementalBm25]]) as an O(batch) epoch-keyed append, then the
  * standing query's top-k is re-served FROM the index — corpus-so-far
  * including the batch — into an epoch-keyed snapshot table. The
  * streaming form of a search index following a rolling crawl; batch
  * semantics are oracle-gated via `llm_bm25_incremental`.
  *
  * Delivery: at-least-once from the checkpoint, made exactly-once for
  * BOTH tables by epoch keying. Here the snapshot may INCLUDE the
  * batch's own epoch (unlike the dedup family's exclude-own-epoch
  * reads): the fold is an idempotent overwrite of `__epoch=b<batchId>`,
  * so a replay that crashed between fold and checkpoint-commit re-folds
  * to the identical index state and re-serves a byte-identical
  * snapshot, which then overwrites its own `__epoch=b<batchId>` rows
  * (asserted in the spec). */
object StreamBm25 {

  def start(docs: DataFrame, indexPath: String, queryTerms: Seq[String],
            k: Int, outDir: String, checkpointDir: String,
            idCol: String = "doc_id", textCol: String = "text",
            triggerInterval: String = "1 second"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        IncrementalBm25.appendToIndex(batch, idCol, textCol, indexPath,
          epoch = s"b$batchId")
        IncrementalBm25.search(spark, indexPath, queryTerms, k)
          .write.mode("overwrite").parquet(s"$outDir/__epoch=b$batchId")
      }
      .start()
}
