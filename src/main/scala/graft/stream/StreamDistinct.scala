package graft.stream

import graft.ext.IncrementalDistinct

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distinct-count maintenance on the persisted HLL store:
  * each micro-batch is sketched once (its only scan), the all-time
  * per-group estimate (store ∪ batch) lands epoch-keyed in `outDir`,
  * and the batch's sketches fold in as a constant-size epoch append —
  * the live "distinct users ever, by event type" dashboard at O(batch)
  * per trigger.
  *
  * Delivery: the house exactly-once-by-epoch argument — appends
  * overwrite `__epoch=b<batchId>` on replay, report rows land
  * epoch-keyed, and the estimate excludes the batch's own epoch so a
  * crashed-after-append replay reads exactly the pre-batch store.
  * Batch semantics are gated via `events_distinct_incremental_check`
  * (merge-lossless + error envelope). */
object StreamDistinct {

  def start(rows: DataFrame, indexPath: String, outDir: String,
            checkpointDir: String, groupCol: String, valueCol: String,
            triggerInterval: String = "1 second"): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          estimateExcluding(spark, indexPath, b, groupCol, valueCol,
              Seq(s"b$batchId"))
            .write.mode("overwrite").parquet(s"$outDir/__epoch=b$batchId")
          IncrementalDistinct.appendToIndex(b, groupCol, valueCol,
            indexPath, epoch = s"b$batchId")
        } finally { b.unpersist(); () }
      }
      .start()

  /** [[IncrementalDistinct.estimate]] with the replay seam: stored
    * epochs in `exclude` are ignored so a replayed batch reads the
    * pre-batch store. */
  def estimateExcluding(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, groupCol: String, valueCol: String,
      exclude: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val lgK = spark.read.parquet(s"$path/meta").head().getAs[Int]("lg_k")
    val stored0 = spark.read.parquet(s"$path/sketches")
    val stored =
      (if (exclude.isEmpty) stored0
       else stored0.where(!col("__epoch").isin(exclude: _*)))
        .select(col("group"), col("sketch"))
    val fresh = batch.groupBy(col(groupCol).as("group"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
    stored.unionByName(fresh)
      .groupBy("group")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_est"))
      .withColumnRenamed("group", groupCol)
  }
}
