package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingest-side counterpart of
  * [[graft.ext.Dedup.exact]] for a continuously-arriving document
  * stream (SURVEY.md §2.8 extension surface): keep the FIRST occurrence
  * of each distinct content, drop later copies arriving within the
  * watermark horizon.
  *
  * Scale design:
  *  - dedup state is keyed on a fixed-width sha-256 content digest, so
  *    the state store and the pre-dedup shuffle carry 32-byte keys, not
  *    document bodies — the same digest-not-body rule as the batch op;
  *  - `dropDuplicatesWithinWatermark` (not `dropDuplicates`) bounds the
  *    state store: a digest is retained only until the event-time
  *    watermark passes it, so state size is arrival-rate × horizon,
  *    never corpus size. Unbounded streaming dedup of a 100 TB corpus
  *    is a non-starter — cross-horizon duplicates are the BATCH
  *    operator's job (run [[graft.ext.Dedup]] over the landed table);
  *    the streaming op's contract is "no duplicates within the horizon".
  */
object StreamDedup {

  /** Drop stream rows whose `textCol` content already occurred within
    * the `horizon` (event-time watermark delay on `tsCol`). Emits
    * surviving rows unchanged (append mode). */
  def exactWithinWatermark(stream: DataFrame, textCol: String,
                           tsCol: String, horizon: String): DataFrame =
    stream
      .withColumn("__graft_digest", sha2(col(textCol).cast("binary"), 256))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__graft_digest")
      .drop("__graft_digest")
}
