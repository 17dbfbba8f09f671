package graft.stream

import graft.ext.{Ivf, Similarity}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming EMBEDDING-index maintenance — the vector-space member of
  * the streaming maintenance family ([[StreamNearDup]] exact text,
  * [[StreamMinHash]] signature text, [[StreamDecontam]] benchmark
  * grams): each arriving micro-batch of (id, embedding) rows is flagged
  * for near-duplicates against everything ingested before it via the
  * PERSISTED IVF index (cells pruned, top-k per probe, exact-cosine
  * verified), plus exact pairs within the batch itself (batch-sized by
  * contract — the [[graft.queries.LlmQueries.cosineNearDupIncremental]]
  * shape); the pair report lands epoch-keyed in a parquet table
  * (readers see an `__epoch` partition column), and the batch then
  * folds into the index as an O(batch) epoch-keyed append.
  *
  * The coarse quantizer stays FIXED across the stream (the
  * [[Ivf.appendToIndex]] train-once contract): cell assignments are
  * made under the index's own model, so recall under drift degrades
  * gracefully until a scheduled offline re-train + re-bucket.
  *
  * Delivery: at-least-once from the checkpoint, exactly-once for the
  * index AND the pair report by epoch-keyed overwrite (a replayed
  * batch rewrites its own `__epoch=b<batchId>` partitions in both),
  * and the flag pass excludes the batch's own epoch from the index
  * read, so a crash between append and checkpoint-commit replays
  * byte-identically — no self-pairs, no duplicated report rows
  * (asserted in the spec). */
object StreamIvf {

  /** Start the flag-then-append stream. `vectors` is a streaming
    * DataFrame with `idCol` and `vecCol`; ids must be globally unique
    * across the stream and the pre-built index. */
  def start(vectors: DataFrame, indexPath: String, outDir: String,
            checkpointDir: String,
            idCol: String = "vec_id", vecCol: String = "embedding",
            threshold: Double = 0.35, k: Int = 20, nProbe: Int = 4,
            triggerInterval: String = "1 second"): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val epoch = s"b$batchId"
        // Pin the batch: probed (queries side), self-paired, and
        // appended — three scans of one micro-batch.
        batch.persist()
        try {
          val newOld = Ivf.topKIndexed(spark, indexPath, batch, idCol,
              vecCol, k, nProbe, excludeEpochs = Seq(epoch))
            .where(col("sim") >= threshold)
            .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
              greatest(col("query_id"), col("neighbor_id")).as("id_b"),
              col("sim"))
          val newNew = Similarity.exactCosinePairs(batch, idCol, vecCol,
            threshold)
          newOld.unionByName(newNew)
            .write.mode("overwrite").parquet(s"$outDir/__epoch=$epoch")
          Ivf.appendToIndex(batch, vecCol, indexPath, epoch)
        } finally { batch.unpersist(); () }
      }
      .start()
}
