package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpanDedupSpec extends SparkSpecBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val real = "/root/testdata/sf0.001/documents.parquet"

  private def restrictedFull(all: DataFrame, w: Int): Seq[String] =
    SpanDedup.spans(all, "doc_id", "text", w)
      .where(col("doc_id") % 10 === 0)
      .orderBy("doc_id", "span_start")
      .collect().map(_.toString).toSeq

  test("incremental == full recompute restricted to the shard (real corpus)") {
    val all = spark.read.parquet(real)
    val dir = tmp("inc-span")
    IncrementalSpanDedup.writeIndex(
      all.where(col("doc_id") % 10 =!= 0), "doc_id", "text", dir, w = 12)
    val inc = IncrementalSpanDedup.spans(spark, dir,
        all.where(col("doc_id") % 10 === 0), "doc_id", "text")
      .orderBy("doc_id", "span_start")
      .collect().map(_.toString).toSeq
    assert(inc === restrictedFull(all, 12))
    assert(inc.nonEmpty, "fixture shard must exercise the probe")
  }

  test("a window duplicated ONLY by the shard's second occurrence is flagged") {
    val s = spark; import s.implicits._
    val run = (1 to 20).map(i => s"r$i").mkString(" ")
    val corpus = Seq((1L, run), (2L, "other words")).toDF("doc_id", "text")
    val batch = Seq((10L, run)).toDF("doc_id", "text") // 2nd occurrence
    val dir = tmp("inc-span2")
    IncrementalSpanDedup.writeIndex(corpus, "doc_id", "text", dir, w = 12)
    val sp = IncrementalSpanDedup.spans(spark, dir, batch, "doc_id", "text")
      .collect()
    assert(sp.length === 1 && sp.head.getLong(0) === 10L &&
      sp.head.getLong(1) === 1L && sp.head.getLong(2) === 20L)
  }

  test("shard-internal repeats flag without any corpus occurrence") {
    val s = spark; import s.implicits._
    val run = (1 to 15).map(i => s"q$i").mkString(" ")
    val corpus = Seq((1L, "nothing shared here")).toDF("doc_id", "text")
    val batch = Seq((10L, run), (11L, run)).toDF("doc_id", "text")
    val dir = tmp("inc-span3")
    IncrementalSpanDedup.writeIndex(corpus, "doc_id", "text", dir, w = 12)
    val sp = IncrementalSpanDedup.spans(spark, dir, batch, "doc_id", "text")
      .collect()
    assert(sp.map(_.getLong(0)).sorted.toSeq === Seq(10L, 11L))
  }

  test("append is replay-idempotent and excludeEpochs restores the pre-batch read") {
    val s = spark; import s.implicits._
    val run = (1 to 20).map(i => s"e$i").mkString(" ")
    val corpus = Seq((1L, "base words only")).toDF("doc_id", "text")
    val batch = Seq((10L, run)).toDF("doc_id", "text")
    val dir = tmp("inc-span4")
    IncrementalSpanDedup.writeIndex(corpus, "doc_id", "text", dir, w = 12)
    // no dup before the append
    assert(IncrementalSpanDedup.spans(spark, dir, batch, "doc_id", "text")
      .count() === 0L)
    IncrementalSpanDedup.appendToIndex(batch, "doc_id", "text", dir, "b1")
    IncrementalSpanDedup.appendToIndex(batch, "doc_id", "text", dir, "b1")
    // replayed epoch never double-counts: excluding it restores zero
    assert(IncrementalSpanDedup.spans(spark, dir, batch, "doc_id", "text",
      excludeEpochs = Seq("b1")).count() === 0L)
    // with the epoch in, the batch window now has a prior occurrence
    assert(IncrementalSpanDedup.spans(spark, dir, batch, "doc_id", "text")
      .count() === 1L)
  }

  test("compact folds epochs to one with identical results") {
    val all = spark.read.parquet(real)
    val dir = tmp("inc-span-c")
    IncrementalSpanDedup.writeIndex(
      all.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 =!= 0),
      "doc_id", "text", dir, w = 12, windowBuckets = 4)
    IncrementalSpanDedup.appendToIndex(
      all.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0),
      "doc_id", "text", dir, "b1")
    val batch = all.where(col("doc_id") % 10 === 0)
    val before = IncrementalSpanDedup.spans(spark, dir, batch,
      "doc_id", "text").orderBy("doc_id", "span_start")
      .collect().map(_.toString).toSeq
    IncrementalSpanDedup.compact(spark, dir)
    val after = IncrementalSpanDedup.spans(spark, dir, batch,
      "doc_id", "text").orderBy("doc_id", "span_start")
      .collect().map(_.toString).toSeq
    assert(after === before)
    assert(before.nonEmpty)
    val epochs = new java.io.File(s"$dir/counts").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__epoch="))
    assert(epochs.toSeq === Seq("__epoch=base"), s"got ${epochs.toSeq}")
  }

  test("a compaction crashed at EVERY rename point rolls forward on next read") {
    val all = spark.read.parquet(real)
    val batch = all.where(col("doc_id") % 10 === 0)
    // swap renames: meta aside, counts aside, counts in, meta in = 4
    for (crashAt <- 0 until 4) {
      val dir = tmp(s"inc-span-x$crashAt")
      IncrementalSpanDedup.writeIndex(
        all.where(col("doc_id") % 10 =!= 0), "doc_id", "text", dir, w = 12)
      IncrementalSpanDedup.appendToIndex(batch, "doc_id", "text", dir, "b1")
      val expect = IncrementalSpanDedup.spans(spark, dir, batch,
        "doc_id", "text").orderBy("doc_id", "span_start")
        .collect().map(_.toString).toSeq
      intercept[IllegalStateException] {
        IncrementalSpanDedup.compactImpl(spark, dir, crashAtRename = crashAt)
      }
      val got = IncrementalSpanDedup.spans(spark, dir, batch,
        "doc_id", "text").orderBy("doc_id", "span_start")
        .collect().map(_.toString).toSeq
      assert(got === expect, s"crash point $crashAt broke the table")
    }
  }

  test("bucketed layout: identical output; probe scan is partition-pruned") {
    val all = spark.read.parquet(real)
    val flat = tmp("inc-span-f"); val bkt = tmp("inc-span-b")
    val corpus = all.where(col("doc_id") % 10 =!= 0)
    val batch = all.where(col("doc_id") % 10 === 0)
    IncrementalSpanDedup.writeIndex(corpus, "doc_id", "text", flat, w = 12)
    IncrementalSpanDedup.writeIndex(corpus, "doc_id", "text", bkt, w = 12,
      windowBuckets = 8)
    val a = IncrementalSpanDedup.spans(spark, flat, batch, "doc_id", "text")
      .orderBy("doc_id", "span_start").collect().toSeq
    val b = IncrementalSpanDedup.spans(spark, bkt, batch, "doc_id", "text")
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(a === b)
    // layout really is bucketed
    val dirs = new java.io.File(s"$bkt/counts/__epoch=base").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__wb=")).toSet
    assert(dirs.nonEmpty, "expected __wb= partition dirs")
    // a probe restricted to a bucket subset plans a PartitionFilter
    val pruned = spark.read.parquet(s"$bkt/counts")
      .where(col("__wb").isin(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__wb"),
      s"no partition filter in:\n$plan")
  }
}
