package graft.sink

import org.apache.spark.sql.DataFrame

/** The contract the streaming pipeline writes through: apply one
  * micro-batch of change rows (payload ++ version ++ delete flag) and
  * expose the current table state. Implementations: [[KeyedUpsertTable]]
  * (full-COW rewrite, reference parity) and [[BucketedUpsertTable]]
  * (incremental bucket rewrite, the 100 TB path). */
trait UpsertSink {
  def upsert(batch: DataFrame): Unit
  def read(): Option[DataFrame]
}
