package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Zero-cost-when-off wall-time accounting for the streaming pipeline's
  * per-batch stages (enable with `GRAFT_STREAM_PROF=1`). Totals are
  * CUMULATIVE wall seconds per stage label across all batches; table
  * stages run concurrently on the fan-out pool, so their sum can exceed
  * the batch wall time — the numbers attribute COST, not the critical
  * path. Used by [[graft.stream.StreamBench]] to print the stage
  * breakdown behind the events/s headline. */
object StageProf {

  val enabled: Boolean = sys.env.contains("GRAFT_STREAM_PROF")

  private val totals = new ConcurrentHashMap[String, LongAdder]()
  private val counts = new ConcurrentHashMap[String, LongAdder]()

  @inline def timed[A](stage: String)(body: => A): A =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      try body
      finally {
        totals.computeIfAbsent(stage, _ => new LongAdder).add(System.nanoTime() - t0)
        counts.computeIfAbsent(stage, _ => new LongAdder).increment()
      }
    }

  def reset(): Unit = { totals.clear(); counts.clear() }

  /** One line per stage, sorted by descending total: `stage total_s n avg_ms`. */
  def report(): String = {
    import scala.jdk.CollectionConverters._
    totals.asScala.toSeq.sortBy(-_._2.sum).map { case (k, v) =>
      val n = counts.get(k).sum
      f"  $k%-28s ${v.sum / 1e9}%8.3f s  n=$n%-4d avg=${v.sum / 1e6 / math.max(1, n)}%8.1f ms"
    }.mkString("\n")
  }
}
