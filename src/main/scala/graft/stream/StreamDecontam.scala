package graft.stream

import graft.ext.Decontamination

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming incremental decontamination: every arriving micro-batch of
  * documents is flagged IN-FLIGHT against the persisted benchmark-gram
  * index ([[Decontamination.writeIndex]]) and the per-doc report lands
  * in an append-only parquet table — the ingest-time contamination
  * check a production pipeline runs on each shard BEFORE it reaches the
  * training corpus, instead of a full-corpus batch sweep afterwards.
  *
  * Shape: `foreachBatch` → [[Decontamination.flagAgainstIndex]] (the
  * gram set is read from the index and broadcast; the batch is never
  * shuffled on the gram) → parquet append. At-least-once from the
  * checkpoint; the report is keyed by doc id and deterministic, so
  * replayed batches append duplicate-but-identical rows a downstream
  * reader dedups by id (or a keyed sink absorbs).
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Decontamination.flagAgainstIndex(batch.sparkSession, indexPath,
            batch, idCol, textCol)
          .write.mode("append").parquet(outDir)
      }
      .start()
}
