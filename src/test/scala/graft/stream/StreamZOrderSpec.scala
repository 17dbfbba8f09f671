package graft.stream

import graft.SparkSpecBase
import graft.sink.ZOrderLayout

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming ingestion into the z-order clustered table: mid-stream
  * pruned reads cover all ingest, the inline recluster folds committed
  * epochs without losing rows, and the crash-replay seam (fold
  * committed, preserve current, re-append) is exactly-once. */
class StreamZOrderSpec extends SparkSpecBase {

  private def row(i: Long): (Long, Long, Double) = (i, i % 64, (i % 64) * 1.5)

  test("each batch lands as an epoch append; pruned reads cover all ingest") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val dir = Files.createTempDirectory("szo").toString
    val base = (0L until 1000L).map(row).toDF("id", "x", "y")
    ZOrderLayout.write(base, Seq("x", "y"), dir, targetFiles = 8)

    val ckpt = Files.createTempDirectory("szo-ckpt").toString
    val input = MemoryStream[(Long, Long, Double)]
    // optimizeEvery = 1: the recluster path runs on batch 1, exercising
    // fold-committed + preserve-current mid-stream
    val q = StreamZOrder.start(input.toDF().toDF("id", "x", "y"), dir, ckpt,
      batchFiles = 2, optimizeEvery = 1, targetFiles = 8)
    try {
      input.addData((1000L until 2000L).map(row): _*)
      q.processAllAvailable()
      assert(ZOrderLayout.read(spark, dir).count() === 2000)
      input.addData((2000L until 3000L).map(row): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(ZOrderLayout.read(spark, dir).count() === 3000)
    val ranges: ZOrderLayout.Ranges = Map("x" -> (Some(10.0), Some(20.0)))
    val pruned = ZOrderLayout.readPruned(spark, dir, ranges)
      .select("id").collect().map(_.getLong(0)).toSet
    val expect = (0L until 3000L).filter(i => i % 64 >= 10 && i % 64 <= 20).toSet
    assert(pruned === expect)
    val (kept, total) = ZOrderLayout.candidateFiles(spark, dir, ranges)
    assert(kept.size < total, s"kept ${kept.size} of $total")
  }

  test("rederiveBoundaries stream: drifted ingest re-buckets at the recluster") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._
    val dir = Files.createTempDirectory("szo-d").toString
    val base = (0L until 1000L).map(row).toDF("id", "x", "y")
    ZOrderLayout.write(base, Seq("x", "y"), dir, targetFiles = 8)
    // drifted stream: keys entirely above the stored boundaries
    def drifted(i: Long): (Long, Long, Double) =
      (i, 1000L + i % 64, 1000.0 + (i % 64) * 1.5)
    val ckpt = Files.createTempDirectory("szo-d-ckpt").toString
    val input = MemoryStream[(Long, Long, Double)]
    val q = StreamZOrder.start(input.toDF().toDF("id", "x", "y"), dir, ckpt,
      batchFiles = 2, optimizeEvery = 2, targetFiles = 8,
      rederiveBoundaries = true)
    try {
      input.addData((1000L until 2000L).map(drifted): _*)
      q.processAllAvailable()
      input.addData((2000L until 3000L).map(drifted): _*)
      q.processAllAvailable() // batch 2 reclusters with fresh boundaries
      input.addData((3000L until 4000L).map(drifted): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(ZOrderLayout.read(spark, dir).count() === 4000)
    // after the rederive, a rectangle inside the DRIFTED range prunes:
    // the re-derived boundaries subdivide it, so files are skipped and
    // the pruned answer stays exact
    val ranges: ZOrderLayout.Ranges = Map("x" -> (Some(1010.0), Some(1020.0)))
    val pruned = ZOrderLayout.readPruned(spark, dir, ranges)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned === (1000L until 4000L)
      .filter(i => i % 64 >= 10 && i % 64 <= 20).toSet)
    val (kept, total) = ZOrderLayout.candidateFiles(spark, dir, ranges)
    assert(kept.size < total,
      s"drifted rectangle must prune after rederive: kept ${kept.size} of $total")
  }

  test("crash replay: fold-committed + preserve-current + re-append is exactly-once") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("szo-r").toString
    val base = (0L until 1000L).map(row).toDF("id", "x", "y")
    ZOrderLayout.write(base, Seq("x", "y"), dir, targetFiles = 8)
    val b1 = (1000L until 1500L).map(row).toDF("id", "x", "y")
    val b2 = (1500L until 2000L).map(row).toDF("id", "x", "y")
    // batch 1 commits; batch 2's attempt appends its epoch then CRASHES
    // before the checkpoint commit
    ZOrderLayout.append(b1, dir, "b1", batchFiles = 2)
    ZOrderLayout.append(b2, dir, "b2", batchFiles = 2)
    // replay of batch 2 under the stream's discipline: optimize folds
    // committed epochs only (preserving b2), then the append overwrites
    // b2 — every row exactly once
    ZOrderLayout.optimize(spark, dir, targetFiles = 8,
      preserveEpochs = Seq("b2"))
    ZOrderLayout.append(b2, dir, "b2", batchFiles = 2)
    val ids = ZOrderLayout.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (0L until 2000L))
    // and the manifest stayed consistent: pruning still exact
    val ranges: ZOrderLayout.Ranges = Map("x" -> (Some(0.0), Some(5.0)))
    val pruned = ZOrderLayout.readPruned(spark, dir, ranges)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned === (0L until 2000L).filter(i => i % 64 <= 5).toSet)
  }
}
