package graft.stream

import graft.ext.IncrementalDomainCap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-domain admission control: each arriving micro-batch of
  * documents is judged against the persisted kept-count index
  * ([[IncrementalDomainCap]]) under first-come semantics, the
  * (id, domain, admitted) report lands epoch-keyed in a parquet table,
  * and the batch's admissions are folded into the index as an O(batch)
  * append, so the next batch sees this one's budget consumption. The
  * streaming form of the FineWeb per-domain cap over a rolling crawl;
  * batch semantics are oracle-gated via `llm_domain_cap_incremental`.
  *
  * Delivery: at-least-once from the checkpoint, made exactly-once for
  * BOTH tables by epoch keying — the index append overwrites its own
  * `__epoch=b<batchId>` rows on replay, the report overwrites its own
  * `__epoch=b<batchId>` partition, and both passes EXCLUDE the batch's
  * own epoch from the index read, so a replay that crashed between
  * append and checkpoint-commit still reads exactly the pre-batch
  * budget and rewrites byte-identical rows (the [[StreamLineDedup]]
  * argument, asserted in the spec). */
object StreamDomainCap {

  def start(docs: DataFrame, indexPath: String, outDir: String,
            checkpointDir: String, idCol: String = "doc_id",
            domainCol: String = "domain",
            triggerInterval: String = "1 second"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // the admit pass scans the batch twice (domains + ranks) and
        // the append twice more — pin it
        batch.persist()
        try {
          IncrementalDomainCap.admit(spark, indexPath, batch,
              idCol, domainCol, excludeEpochs = Seq(s"b$batchId"))
            .write.mode("overwrite").parquet(s"$outDir/__epoch=b$batchId")
          IncrementalDomainCap.appendToIndex(batch, idCol, domainCol,
            indexPath, epoch = s"b$batchId")
        } finally { batch.unpersist(); () }
      }
      .start()
}
