package graft.stream

import graft.cdc.CdcJobConfig

/** The reference's entry point, Spark-native: load a `.properties` job
  * config (`/root/reference/glue/cdc_hudi.py:40-78`, §S4), build the
  * session with the reference's settings (Kryo + FAIR), wire the Kafka
  * value stream into the CDC pipeline, and block on the query.
  *
  * `graft.stream.CdcApp /path/to/job.properties [master]` — requires the
  * spark-sql-kafka connector on the classpath (not present in the
  * offline build/test environment; every layer below the source is
  * exercised by the MemoryStream e2e suite instead). */
object CdcApp {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CdcApp <job.properties> [master]")
    val cfg = CdcJobConfig.load(args(0))
    val master = if (args.length > 1) args(1) else "local[*]"
    val spark = CdcPipeline.sessionBuilder(master).getOrCreate()
    val listener = new OffsetCommitListener
    spark.streams.addListener(listener)
    val pipeline = new CdcPipeline(spark, cfg.toPipelineConfig)
    val source = CdcPipeline.kafkaSource(spark, cfg.kafkaBroker, cfg.topic,
      startingOffsets = cfg.startingOffsets,
      maxOffsetsPerTrigger = cfg.maxOffsetsPerTrigger,
      groupId = Some(cfg.consumerGroup),
      startingTimestamp = cfg.startingTimestamp)
    val query = pipeline.start(source)
    try query.awaitTermination()
    finally pipeline.shutdown()
  }
}
