package graft.stream

import graft.ext.Decontamination

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming incremental decontamination: every arriving micro-batch of
  * documents is flagged IN-FLIGHT against the persisted benchmark-gram
  * index ([[Decontamination.writeIndex]]) and the per-doc report lands
  * epoch-keyed in a parquet table — the ingest-time contamination
  * check a production pipeline runs on each shard BEFORE it reaches the
  * training corpus, instead of a full-corpus batch sweep afterwards.
  *
  * Shape: `foreachBatch` → [[Decontamination.flagAgainstIndex]] (the
  * gram set is read from the index and broadcast; the batch is never
  * shuffled on the gram) → epoch-keyed parquet overwrite
  * (`__epoch=b<batchId>`, surfaced to readers as a partition column).
  * At-least-once from the checkpoint, exactly-once for the report: the
  * flag output is deterministic, so a replayed batch overwrites its own
  * epoch with identical rows instead of appending duplicates.
  */
object StreamDecontam {

  /** Start the flagging stream. `docs` is a streaming DataFrame with
    * `idCol` and `textCol` columns. */
  def start(docs: DataFrame, indexPath: String, outDir: String,
            checkpointDir: String, idCol: String = "doc_id",
            textCol: String = "text",
            triggerInterval: String = "1 second"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Decontamination.flagAgainstIndex(batch.sparkSession, indexPath,
            batch, idCol, textCol)
          .write.mode("overwrite").parquet(s"$outDir/__epoch=b$batchId")
      }
      .start()
}
