package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class IncrementalSemDedupSpec extends SparkSpecBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val real = "/root/testdata/sf0.001/embeddings.parquet"

  test("incremental == one-shot prune over the union under the index's model") {
    val all = spark.read.parquet(real)
    val corpus = all.where(col("vec_id") % 10 =!= 0)
    val batch = all.where(col("vec_id") % 10 === 0)
    val dir = tmp("inc-sem")
    IncrementalSemDedup.writeIndex(corpus, "vec_id", "embedding", dir,
      nCells = 16)
    val inc = IncrementalSemDedup.prune(spark, dir, batch,
        "vec_id", "embedding", 0.35)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val model = Ivf.load(spark, s"$dir/model")
    val full = SemDedup.prune(all, "vec_id", "embedding", model, 0.35)
      .where(col("vec_id") % 10 === 0)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(inc === full)
    assert(inc.nonEmpty, "fixture shard must exercise the probe")
  }

  test("an earlier-in-batch witness prunes a later batch vector") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // both lean toward the same centroid (a pure third axis would tie
    // at dot 0 with every centroid and the pair could split cells)
    val batch = Seq(
      (10L, Seq(0f, 0.1f, 0.99f, 0f)), (11L, Seq(0f, 0.11f, 0.98f, 0f)))
      .toDF("vec_id", "embedding")
    val dir = tmp("inc-sem2")
    IncrementalSemDedup.writeIndex(corpus, "vec_id", "embedding", dir,
      nCells = 2)
    val out = IncrementalSemDedup.prune(spark, dir, batch,
        "vec_id", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(10L) === true && out(11L) === false)
  }

  test("append is replay-idempotent; excludeEpochs restores the pre-batch read") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val batch = Seq((10L, Seq(0.99f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding")
    val dir = tmp("inc-sem3")
    IncrementalSemDedup.writeIndex(corpus, "vec_id", "embedding", dir,
      nCells = 1)
    val before = IncrementalSemDedup.prune(spark, dir, batch,
      "vec_id", "embedding", 0.9).collect().map(_.toString).toSeq
    IncrementalSemDedup.appendToIndex(batch, "embedding", dir, "b1")
    IncrementalSemDedup.appendToIndex(batch, "embedding", dir, "b1")
    val replay = IncrementalSemDedup.prune(spark, dir, batch,
      "vec_id", "embedding", 0.9, excludeEpochs = Seq("b1"))
      .collect().map(_.toString).toSeq
    assert(replay === before)
    // 10 is within tau of indexed 1 -> pruned in both reads
    assert(before.exists(_.contains("false")))
  }
}
