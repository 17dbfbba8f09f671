package graft.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Z-order layout micro-bench: the measured form of the file-skipping
  * claim. Clusters the events table on (user_id, value) once, then
  * times the gated rectangle as (a) a full scan of the clustered table
  * with the row predicate and (b) the manifest-pruned read — same
  * answer (oracle-gated by `events_zorder_pruned`), different IO. At
  * sf0.1 the absolute times are small; the `files_read`/`files_total`
  * ratio is the number that scales (pruned IO stays proportional to
  * the rectangle, not the table). */
object LayoutBench {
  final case class Result(filesTotal: Int, filesRead: Int, rows: Long,
                          fullSec: Double, prunedSec: Double)

  private val Ranges: ZOrderLayout.Ranges =
    Map("user_id" -> (Some(10.0), Some(20.0)),
        "value" -> (Some(5.0), Some(10.0)))

  def run(spark: SparkSession, sfDir: String): Result = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zbench").toString
    ZOrderLayout.write(
      spark.read.parquet(s"$sfDir/events.parquet"),
      Seq("user_id", "value"), dir, targetFiles = 32)
    val (kept, total) = ZOrderLayout.candidateFiles(spark, dir, Ranges)
    def filtered(df: org.apache.spark.sql.DataFrame) = df
      .where(col("user_id").cast("double").between(10.0, 20.0) &&
        col("value").cast("double").between(5.0, 10.0))
    // warm both paths once (footer caches), then time
    filtered(ZOrderLayout.read(spark, dir)).count()
    ZOrderLayout.readPruned(spark, dir, Ranges).count()
    val t0 = System.nanoTime()
    val rows = filtered(ZOrderLayout.read(spark, dir)).count()
    val fullSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val rowsPruned = ZOrderLayout.readPruned(spark, dir, Ranges).count()
    val prunedSec = (System.nanoTime() - t1) / 1e9
    require(rows == rowsPruned,
      s"pruned read lost rows: full=$rows pruned=$rowsPruned")
    Result(total, kept.size, rows, fullSec, prunedSec)
  }
}
