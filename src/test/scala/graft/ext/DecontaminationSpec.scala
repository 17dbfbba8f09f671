package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-overlap decontamination: hand-checked hit counts, short-doc
  * zero rows, case folding, and the broadcast-join plan shape. */
class DecontaminationSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("contaminated doc flagged; clean doc not; hit counts exact") {
    // n=3 grams. Corpus doc 1 shares "b c d" with the bench; doc 2 none.
    val corpus = docs((1L, "a b c d"), (2L, "x y z w"))
    val bench = docs((100L, "b c d e"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toSeq ===
      Seq((1L, 2L, 1L, true), (2L, 2L, 0L, false)))
  }

  test("docs shorter than n kept with (0, 0, false)") {
    val corpus = docs((1L, "just two"), (2L, "one two three four"))
    val bench = docs((100L, "one two three"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_hits"))).toSeq === Seq((1L, 0L, 0L), (2L, 2L, 1L)))
  }

  test("grams are lowercased: case-variant copies still collide") {
    val corpus = docs((1L, "The Quick Brown Fox"))
    val bench = docs((100L, "the quick brown fox"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .collect()
    assert(out.length === 1 && out(0).getAs[Boolean]("contaminated"))
  }

  test("repeated gram in one doc counts once (distinct shingles)") {
    // "a b a b a b" with n=2 → distinct grams {a b, b a}; bench has "a b".
    val corpus = docs((1L, "a b a b a b"))
    val bench = docs((100L, "a b"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 2)
      .collect()
    assert(out(0).getAs[Long]("n_grams") === 2L)
    assert(out(0).getAs[Long]("n_hits") === 1L)
  }

  test("plan: bench side broadcast, corpus never shuffled before the join") {
    val corpus = docs((1L, "a b c d"), (2L, "x y z w"))
    val bench = docs((100L, "b c d e"))
    val plan = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join against the bench grams:\n$plan")
  }
}
