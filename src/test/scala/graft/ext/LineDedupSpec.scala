package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("lines: newline split, empty lines dropped, 1-based line_idx") {
    val d = df(1L -> "alpha\n\n  \nbeta\ngamma", 2L -> "solo")
    val got = LineDedup.lines(d, "doc_id", "text")
      .orderBy("doc_id", "line_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // blank/whitespace-only lines vanish but surviving lines keep their
    // ORIGINAL position index (alpha=1, beta=4, gamma=5)
    assert(got.toSeq === Seq((1L, 1L, "alpha"), (1L, 4L, "beta"),
      (1L, 5L, "gamma"), (2L, 1L, "solo")))
  }

  test("chunkLines: non-overlapping w-word chunks, ragged tail kept") {
    val d = df(1L -> "a b c d e f g", 2L -> "x")
    val got = LineDedup.chunkLines(d, "doc_id", "text", w = 3)
      .orderBy("doc_id", "line_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, 1L, "a b c"), (1L, 2L, "d e f"),
      (1L, 3L, "g"), (2L, 1L, "x")))
  }

  test("dropBoilerplate: cross-doc lines removed everywhere, df counts DISTINCT docs") {
    // "nav bar" appears in docs 1 and 2 (boilerplate); "echo" repeats
    // only WITHIN doc 3 (df=1 — not boilerplate, both copies survive)
    val d = df(
      1L -> "nav bar\nreal content one",
      2L -> "nav bar\nreal content two",
      3L -> "echo\necho\nunique three")
    val out = LineDedup.dropBoilerplate(d, "doc_id", "text",
        LineDedup.lines(d, "doc_id", "text"), minDocs = 2, sep = "\n")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "real content one", 1L, 1L),
      (2L, "real content two", 1L, 1L),
      (3L, "echo\necho\nunique three", 3L, 0L)))
  }

  test("dropBoilerplate: fully-boilerplate doc survives with empty text") {
    val d = df(1L -> "cookie banner", 2L -> "cookie banner",
      3L -> "cookie banner\nactual article")
    val out = LineDedup.dropBoilerplate(d, "doc_id", "text",
        LineDedup.lines(d, "doc_id", "text"), minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, "", 0L, 1L), (2L, "", 0L, 1L),
      (3L, "actual article", 1L, 1L)))
  }

  test("dedupLines: keep-first by (doc_id, line_idx) total order") {
    val d = df(
      1L -> "shared\nown one",
      2L -> "shared\nshared\nown two")
    val out = LineDedup.dedupLines(d, "doc_id", "text",
        LineDedup.lines(d, "doc_id", "text"), sep = "\n")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1 line 1 is the global first "shared"; doc 2 loses BOTH its
    // copies (cross-doc and within-doc duplicates alike)
    assert(out.toSeq === Seq(
      (1L, "shared\nown one", 2L, 0L),
      (2L, "own two", 1L, 2L)))
  }

  test("matching is normalized (trim+lower) but output keeps original text") {
    val d = df(1L -> "  Hello World  \nkeep a", 2L -> "hello world\nkeep b")
    val out = LineDedup.dropBoilerplate(d, "doc_id", "text",
        LineDedup.lines(d, "doc_id", "text"), minDocs = 2, sep = "\n")
      .orderBy("doc_id").collect()
    // both case-variants dropped as the same line; survivors verbatim
    assert(out.map(_.getString(1)).toSeq === Seq("keep a", "keep b"))
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 1L))
  }

  test("stats agrees with a text-grouped recount on the real corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lines = LineDedup.chunkLines(real, "doc_id", "text", w = 10)
    val got = LineDedup.stats(lines, "doc_id", minDocs = 2).collect()(0)
    // oracle-free parity: group by the normalized TEXT instead of the
    // 128-bit fingerprint — identical counts proves no collision folded
    // two distinct lines together on this corpus
    val byText = lines.groupBy(trim(lower(col("line"))))
      .agg(count_distinct(col("doc_id")).as("df"), count(lit(1)).as("n_occ"))
      .agg(sum("n_occ"), count(lit(1)),
        sum(when(col("df") >= 2, 1L).otherwise(0L)),
        sum(when(col("df") >= 2, col("n_occ")).otherwise(0L)),
        max("df")).collect()(0)
    for (i <- 0 until 5)
      assert(got.getLong(i) === byText.getLong(i), s"field $i diverges")
    assert(got.getLong(0) > 0L && got.getLong(2) > 0L,
      "fixture corpus should contain boilerplate chunk-lines")
  }
}
