package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class IncrementalNgramLmSpec extends SparkSpecBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val real = "/root/testdata/sf0.001/documents.parquet"

  test("summed per-epoch model == full retrain (count monoid), real corpus") {
    val all = spark.read.parquet(real)
    val dir = tmp("inc-lm")
    IncrementalNgramLm.writeIndex(
      all.where(col("doc_id") % 10 =!= 0), "text", dir)
    IncrementalNgramLm.appendToIndex(
      all.where(col("doc_id") % 10 === 0), "text", dir, "shard1")
    val inc = IncrementalNgramLm.score(spark, dir, all, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val full = NgramLm.selfScore(all, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(inc === full)
  }

  test("charset union across epochs (not a sum): V counts distinct chars once") {
    val s = spark; import s.implicits._
    val dir = tmp("inc-lm2")
    // both epochs share chars a/b; epoch 2 adds c -> V must be 3, not 5
    IncrementalNgramLm.writeIndex(Seq((1L, "abab")).toDF("doc_id", "text"),
      "text", dir)
    IncrementalNgramLm.appendToIndex(Seq((2L, "abc")).toDF("doc_id", "text"),
      "text", dir, "e2")
    val m = IncrementalNgramLm.model(spark, dir)
    assert(m.charset.count() === 3L)
  }

  test("compact folds epochs to one with an identical model") {
    val all = spark.read.parquet(real)
    val dir = tmp("inc-lm-c")
    IncrementalNgramLm.writeIndex(
      all.where(col("doc_id") % 10 =!= 0), "text", dir)
    IncrementalNgramLm.appendToIndex(
      all.where(col("doc_id") % 10 === 0), "text", dir, "shard1")
    val shard = all.where(col("doc_id") % 10 === 0)
    val before = IncrementalNgramLm.score(spark, dir, shard, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    IncrementalNgramLm.compact(spark, dir)
    val after = IncrementalNgramLm.score(spark, dir, shard, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(after === before)
    for (t <- Seq("tri", "big", "chars")) {
      val epochs = new java.io.File(s"$dir/$t").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__epoch="))
      assert(epochs.toSeq === Seq("__epoch=base"), s"$t: ${epochs.toSeq}")
    }
  }

  test("append is replay-idempotent; excludeEpochs restores the pre-append model") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "aaab")).toDF("doc_id", "text")
    val shard = Seq((2L, "aaba")).toDF("doc_id", "text")
    val dir = tmp("inc-lm3")
    IncrementalNgramLm.writeIndex(base, "text", dir)
    val before = NgramLm.score(shard, "doc_id", "text",
      IncrementalNgramLm.model(spark, dir)).collect().toSeq
    IncrementalNgramLm.appendToIndex(shard, "text", dir, "b1")
    IncrementalNgramLm.appendToIndex(shard, "text", dir, "b1") // replay
    // excluding the epoch reproduces the pre-append scores exactly
    val excl = IncrementalNgramLm.score(spark, dir, shard, "doc_id", "text",
      excludeEpochs = Seq("b1")).collect().toSeq
    assert(excl === before)
    // and the replayed epoch counted ONCE: summed model == one retrain
    // over base ∪ shard
    val inc = IncrementalNgramLm.score(spark, dir, shard, "doc_id", "text")
      .collect().toSeq
    val full = NgramLm.score(shard, "doc_id", "text",
      NgramLm.train(base.unionByName(shard), "text")).collect().toSeq
    assert(inc === full)
  }
}
