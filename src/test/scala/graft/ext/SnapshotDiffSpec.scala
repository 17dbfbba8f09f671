package graft.ext

import graft.SparkSpecBase

/** Snapshot diff: every status class on a hand-built pair of versions,
  * null-text presence semantics, and rollup reconciliation. */
class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  private val old = Seq(
    (1L, "same"), (2L, "was this"), (3L, "gone"),
    (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
  private val neu = Seq(
    (1L, "same"), (2L, "now this"), (5L, "brand new"),
    (4L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("all four statuses classified; null text means present-and-empty") {
    val got = SnapshotDiff.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("null text vs real text is a change, not an add/remove") {
    val a = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val b = Seq((1L, "filled in")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(a, b, "doc_id", "text").head()
    assert(got.getString(1) === "changed")
  }

  test("rollup reconciles with the per-doc table") {
    val stats = SnapshotDiff.diffStats(old, neu, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }
}
