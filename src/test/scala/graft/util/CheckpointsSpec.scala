package graft.util

import graft.SparkSpecBase
import graft.ext.Dedup

import org.apache.spark.sql.functions._

/** The checkpoint strategy seam: reliable mode must produce output
  * identical to the default local mode (it only changes where the
  * truncated lineage's blocks live), and misconfiguration fails loudly
  * rather than silently falling back to a non-durable checkpoint. */
class CheckpointsSpec extends SparkSpecBase {

  private def pairs() = {
    val s = spark; import s.implicits._
    // two components incl. a non-clique path (1-2, 2-3) and an island
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
  }

  private def withMode[A](mode: String, dir: String)(body: => A): A = {
    spark.conf.set(Checkpoints.ModeKey, mode)
    if (dir.nonEmpty) spark.conf.set(Checkpoints.DirKey, dir)
    try body
    finally {
      spark.conf.unset(Checkpoints.ModeKey)
      spark.conf.unset(Checkpoints.DirKey)
    }
  }

  // Runs BEFORE the CC parity test: setCheckpointDir is sticky on the
  // shared SparkContext, and the guard only fires while it is unset.
  test("reliable mode without a dir fails loudly (unless already set)") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    withMode("reliable", "") {
      val e = intercept[IllegalArgumentException] {
        Checkpoints.stage(pairs())
      }
      assert(e.getMessage.contains(Checkpoints.DirKey))
    }
  }

  test("reliable checkpoint mode: CC output identical to local mode") {
    val local = Dedup.connectedComponents(pairs())
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val reliable = withMode("reliable", dir) {
      Dedup.connectedComponents(pairs())
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(reliable === local)
    assert(local === Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // the reliable run actually wrote durable checkpoint data
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable mode wrote no checkpoint files")
  }

  test("reliable mode: cleanCorpus output identical to local mode") {
    val sf = "/root/testdata/sf0.001"
    def rows() = graft.queries.LlmQueries.cleanCorpus(spark, sf)
      .collect().map(_.toSeq).toSeq
    val local = rows()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cc").toString
    val reliable = withMode("reliable", dir)(rows())
    assert(reliable === local)
    assert(local.nonEmpty)
  }

  test("unknown mode is rejected") {
    withMode("banana", "") {
      intercept[IllegalArgumentException] { Checkpoints.stage(pairs()) }
    }
  }
}
