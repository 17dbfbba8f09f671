package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental snapshot diff: batch classification equals the batch
  * side of the full diff, later epochs shadow earlier digests, compact
  * preserves the resolved state, and the probe prunes to batch buckets. */
class IncrementalSnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkIdx(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("isd").toString
    IncrementalSnapshotDiff.writeIndex(rows.toDF("doc_id", "text"),
      "doc_id", "text", dir, buckets = 4)
    dir
  }

  test("batch classification equals SnapshotDiff restricted to batch ids") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    val idx = mkIdx(v1)
    val batch = Seq((2L, "b"), (3L, "c2"), (9L, "new")).toDF("doc_id", "text")
    val got = IncrementalSnapshotDiff.diffBatch(spark, idx, batch,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "unchanged", 3L -> "changed", 9L -> "added"))
    val full = SnapshotDiff.diff(v1.toDF("doc_id", "text"), batch,
        "doc_id", "text")
      .where(col("status") =!= "removed")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === full)
  }

  test("a later epoch shadows the base digest; own epoch excludable") {
    val idx = mkIdx(Seq((1L, "orig")))
    val e1 = Seq((1L, "edit one")).toDF("doc_id", "text")
    IncrementalSnapshotDiff.appendToIndex(e1, "doc_id", "text", idx,
      epoch = "b0", seq = 1L)
    // same text as the folded epoch -> unchanged against CURRENT state
    val now = IncrementalSnapshotDiff.diffBatch(spark, idx, e1,
      "doc_id", "text").head().getString(1)
    assert(now === "unchanged")
    // replay view: excluding the in-flight epoch reads the PRE-batch
    // state, so the same rows classify as changed (vs "orig")
    val replay = IncrementalSnapshotDiff.diffBatch(spark, idx, e1,
      "doc_id", "text", excludeEpochs = Seq("b0")).head().getString(1)
    assert(replay === "changed")
  }

  test("compact folds to latest-per-id and preserves every verdict") {
    val idx = mkIdx(Seq((1L, "one"), (2L, "two")))
    IncrementalSnapshotDiff.appendToIndex(
      Seq((1L, "one v2")).toDF("doc_id", "text"), "doc_id", "text", idx,
      epoch = "b0", seq = 1L)
    val batch = Seq((1L, "one v2"), (2L, "two x"), (5L, "five"))
      .toDF("doc_id", "text")
    def verdicts = IncrementalSnapshotDiff.diffBatch(spark, idx, batch,
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val before = verdicts
    IncrementalSnapshotDiff.compact(spark, idx)
    assert(spark.read.parquet(s"$idx/digests")
      .select("__epoch").distinct().collect().map(_.getString(0)).toSeq
      === Seq("base"), "compact must fold every epoch into base")
    assert(verdicts === before)
    assert(before === Map(1L -> "unchanged", 2L -> "changed", 5L -> "added"))
  }

  test("probe prunes the index scan to the batch ids' buckets") {
    val idx = mkIdx((0L to 63L).map(i => (i, s"t$i")))
    val batch = Seq((4L, "t4"), (8L, "x")).toDF("doc_id", "text") // bucket 0 only
    val df = IncrementalSnapshotDiff.diffBatch(spark, idx, batch,
      "doc_id", "text")
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("__db") && (scans.contains("__db#") ||
      scans.contains("PartitionFilters")),
      s"no bucket partition filter visible:\n$scans")
    assert(df.count() === 2)
  }
}
