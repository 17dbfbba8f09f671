package graft.stream

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.ConcurrentHashMap

/** K3: consumed-offset visibility (`/root/reference/README.md:7,10` — the
  * reference attaches an external listener jar that commits offsets back
  * to the Kafka consumer group purely for lag MONITORING; the checkpoint
  * remains the source of truth for recovery, SURVEY.md §2.6).
  *
  * This listener extracts each completed micro-batch's end offsets from
  * the progress event and hands them to `commit` — by default an
  * in-memory record (inspectable in tests); a deployment overrides it
  * with a KafkaConsumer.commitSync call. Non-correctness-bearing by
  * design. */
class OffsetCommitListener extends StreamingQueryListener {

  /** Last observed endOffset JSON per (query, source index). */
  val lastOffsets = new ConcurrentHashMap[String, String]()

  /** Override to push offsets to an external system. */
  def commit(queryName: String, sourceIdx: Int, endOffsetJson: String): Unit =
    lastOffsets.put(s"$queryName/$sourceIdx", endOffsetJson)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    p.sources.zipWithIndex.foreach { case (s, i) =>
      if (s.endOffset != null) commit(Option(p.name).getOrElse(p.id.toString), i, s.endOffset)
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
