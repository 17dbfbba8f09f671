package graft.stream

import graft.ext.IncrementalMinHash

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus maintenance on the SIGNATURE index — the
  * [[StreamNearDup]] loop with [[IncrementalMinHash]] in place of the
  * exact postings index: each arriving micro-batch is flagged for
  * near-dups against everything ingested before it, the pair report
  * lands in an append-only parquet table, and the batch then joins both
  * the corpus store and the signature index as O(batch) epoch-keyed
  * appends.
  *
  * The one structural difference from the exact loop: the signature
  * index carries NO text, so candidate verification needs the corpus
  * itself. The stream therefore maintains `corpusDir` — an epoch-keyed
  * (id, text) parquet mirror of the ingested documents, seeded with the
  * indexed base via [[seedCorpus]] — and the flag pass reads it
  * excluding the batch's own epoch, exactly like the index read. At
  * scale this is the lake's document table (the stream would land docs
  * there anyway); candidate lookups stay a broadcast semi-join on the
  * bounded candidate id set.
  *
  * Delivery: at-least-once from the checkpoint, exactly-once for the
  * index, the corpus store AND the pair report by epoch-keyed
  * overwrite (a replayed batch rewrites its own `__epoch=b<batchId>`
  * partitions in all three), and the
  * flag pass excludes the batch's own epoch from BOTH reads, so a
  * crash between append and checkpoint-commit replays byte-identically
  * (no self-pairs; asserted in the spec). */
object StreamMinHash {

  /** Seed the corpus mirror with the documents the index was built
    * over (written as `__epoch=base`, matching
    * [[IncrementalMinHash.writeIndex]]'s epoch). */
  def seedCorpus(docs: DataFrame, idCol: String, textCol: String,
                 corpusDir: String): Unit =
    docs.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(s"$corpusDir/__epoch=base")

  /** Start the flag-then-append stream. `docs` is a streaming DataFrame
    * with `idCol` and `textCol`; ids must be globally unique across the
    * stream and the pre-built index. */
  def start(docs: DataFrame, indexPath: String, corpusDir: String,
            outDir: String, checkpointDir: String,
            idCol: String = "doc_id", textCol: String = "text",
            threshold: Double = 0.5,
            triggerInterval: String = "1 second"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val epoch = s"b$batchId"
        // Pin the batch: the flag pass scans it several times (shingle,
        // signature, size subplans) and both appends scan it again.
        batch.persist()
        try {
          val corpus = spark.read.parquet(corpusDir)
            .where(col("__epoch") =!= epoch)
            .select(col(idCol), col(textCol))
          IncrementalMinHash.nearDupPairs(spark, indexPath, batch, corpus,
              idCol, textCol, threshold, excludeEpochs = Seq(epoch))
            .write.mode("overwrite").parquet(s"$outDir/__epoch=$epoch")
          batch.select(col(idCol), col(textCol))
            .write.mode("overwrite").parquet(s"$corpusDir/__epoch=$epoch")
          IncrementalMinHash.appendToIndex(batch, idCol, textCol, indexPath,
            epoch)
        } finally { batch.unpersist(); () }
      }
      .start()
}
