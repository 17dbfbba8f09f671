package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val run = (1 to 20).map(i => s"w$i").mkString(" ") // 20 words

  test("a shared run longer than w merges into ONE maximal span per doc") {
    // two docs share a 20-word run; w=12 gives 9 duplicated window
    // starts (pos 1..9 within the run) that must merge into one span
    val d = df(1L -> s"$run tail one", 2L -> s"$run other words here")
    val sp = SpanDedup.spans(d, "doc_id", "text", w = 12)
      .orderBy("doc_id").collect()
    assert(sp.length === 2)
    for (r <- sp) {
      assert(r.getLong(1) === 1L, "span starts at the run head")
      assert(r.getLong(2) === 20L, s"span covers the full shared run: $r")
      assert(r.getLong(3) === 20L)
    }
  }

  test("two separated duplicated regions stay two spans") {
    // doc 1: shared run + 13 unique words + shared run again (within-doc
    // AND cross-doc duplication); doc 2 has one copy of the run
    val gap = (1 to 13).map(i => s"u$i").mkString(" ")
    val d = df(1L -> s"$run $gap $run", 2L -> run)
    val sp = SpanDedup.spans(d, "doc_id", "text", w = 12)
      .orderBy("doc_id", "span_start").collect()
    val doc1 = sp.filter(_.getLong(0) == 1L)
    assert(doc1.length === 2, s"expected 2 islands, got ${doc1.toSeq}")
    assert(doc1(0).getLong(1) === 1L && doc1(0).getLong(2) === 20L)
    assert(doc1(1).getLong(1) === 34L && doc1(1).getLong(2) === 53L)
  }

  test("within-doc repetition alone is a duplicate (minCount counts occurrences)") {
    val d = df(1L -> s"$run $run", 2L -> "completely different text entirely")
    val sp = SpanDedup.spans(d, "doc_id", "text", w = 12).collect()
    assert(sp.nonEmpty && sp.forall(_.getLong(0) == 1L))
  }

  test("no duplicated window -> no spans; docs shorter than w yield none") {
    val d = df(1L -> "a b c", 2L -> (1 to 30).map(i => s"x$i").mkString(" "))
    assert(SpanDedup.spans(d, "doc_id", "text", w = 12).count() === 0L)
  }

  test("fingerprint path is identical to text-grouped path on the real corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = SpanDedup.spans(real, "doc_id", "text", w = 12)
      .orderBy("doc_id", "span_start").collect().toSeq
    val tx = SpanDedup.spansByText(real, "doc_id", "text", w = 12)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(fp === tx)
    assert(fp.nonEmpty, "fixture corpus must exercise the operator")
  }

  test("stats aggregates the span mass against corpus totals") {
    val d = df(1L -> s"$run a b c", 2L -> s"$run d e")
    val r = SpanDedup.stats(d, "doc_id", "text", w = 12).collect().head
    assert(r.getLong(0) === 2L)                 // n_docs
    assert(r.getLong(1) === (23L + 22L))        // total_words
    assert(r.getLong(2) === 2L)                 // docs_affected
    assert(r.getLong(3) === 2L)                 // n_spans
    assert(r.getLong(4) === 40L)                // dup_words
    assert(r.getDouble(5) === 40.0 / 45.0)
  }

  test("cut: the lexicographically first occurrence survives, later ones are dropped") {
    val d = df(1L -> s"$run alpha beta", 2L -> s"prefix word $run")
    val out = SpanDedup.cut(d, "doc_id", "text", w = 12)
      .orderBy("doc_id").collect()
    // doc 1 holds the survivor (min doc_id): nothing cut
    assert(out(0).getLong(2) === 0L)
    assert(out(0).getString(3) === s"$run alpha beta")
    // doc 2 loses exactly the 20 shared words, keeps its own prefix
    assert(out(1).getLong(1) === 22L && out(1).getLong(2) === 20L)
    assert(out(1).getString(3) === "prefix word")
  }

  test("cut: within-doc repeat keeps the first copy only") {
    val d = df(1L -> s"$run mid $run", 2L -> "unrelated words only here")
    val out = SpanDedup.cut(d, "doc_id", "text", w = 12)
      .where(col("doc_id") === 1L).collect().head
    assert(out.getLong(1) === 41L && out.getLong(2) === 20L)
    assert(out.getString(3) === s"$run mid")
  }

  test("cut: untouched docs pass through verbatim (lowercased words rejoined)") {
    val d = df(1L -> "Solo Text With  Mixed   Spacing", 2L -> "another solo")
    val out = SpanDedup.cut(d, "doc_id", "text", w = 12)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 0L)
    assert(out(0).getString(3) === "solo text with mixed spacing")
  }

  test("1-based positions align with the DuckDB slice convention") {
    val win = SpanDedup.windows(df(1L -> "a b c d"), "doc_id", "text",
      w = 3, keepText = true).orderBy("pos").collect()
    assert(win.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(win.map(_.getString(4)).toSeq === Seq("a b c", "b c d"))
  }
}
