package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame

/** C4 page-cleaning rules and the token-exact blocklist filter. */
class C4CleanSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("clean: each line rule fires independently") {
    val d = docs((1L, Seq(
      "this line ends with a period.",     // kept
      "does this line end with a question mark?", // kept
      "no terminal punctuation here",      // dropped: no punct
      "too short.",                        // dropped: < 3 words
      "enable javascript to continue.",    // dropped: javascript
      "ends with a quote\"").mkString("\n")))
    val out = C4Clean.clean(d, "doc_id", "text",
      minWordsPerLine = 3, minLines = 1).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("clean_text") ===
      "this line ends with a period.\n" +
        "does this line end with a question mark?\n" +
        "ends with a quote\"")
    assert(out(0).getAs[Long]("n_lines_kept") === 3L)
    assert(out(0).getAs[Long]("n_lines_in") === 6L)
  }

  test("clean: lorem ipsum and curly-brace markers drop the whole page") {
    val good = "a perfectly fine sentence right here."
    val d = docs(
      (1L, s"$good\nsome Lorem Ipsum filler text."),
      (2L, s"$good\nvar config = { a: 1 }."),
      (3L, good))
    val kept = C4Clean.clean(d, "doc_id", "text",
        minWordsPerLine = 3, minLines = 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(3L))
  }

  test("clean: min-line floor drops pages with too few surviving lines") {
    val d = docs(
      (1L, "one good sentence here.\nsecond good sentence here."),
      (2L, "one good sentence here.\nno punctuation on this one"))
    val kept = C4Clean.clean(d, "doc_id", "text",
        minWordsPerLine = 3, minLines = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(1L))
  }

  test("stats: partitions are exhaustive and line counts add up") {
    val d = docs(
      (1L, "good sentence number one.\ngood sentence number two."), // kept
      (2L, "lorem ipsum dolor sit amet."),                          // marker
      (3L, "just one good sentence.\nand nothing else useful"))     // minlines
    val r = C4Clean.stats(d, "doc_id", "text",
      minWordsPerLine = 3, minLines = 2).collect()(0)
    assert(r.getAs[Long]("docs_in") === 3L)
    assert(r.getAs[Long]("docs_dropped_marker") === 1L)
    assert(r.getAs[Long]("docs_dropped_minlines") === 1L)
    assert(r.getAs[Long]("docs_kept") === 1L)
    assert(r.getAs[Long]("lines_in_kept_docs") === 2L)
    assert(r.getAs[Long]("lines_kept") === 2L)
  }

  test("blocklist: token-exact match, never substring") {
    val s = spark; import s.implicits._
    val terms = Seq("ass", "spam").toDF("term")
    val d = docs(
      (1L, "a class about python"),   // substring only → NOT flagged
      (2L, "the donkey is an ass"),   // whole word → flagged
      (3L, "SPAM in any case"),       // case-folded → flagged
      (4L, "clean text entirely"))
    val hits = C4Clean.blocklistHits(d, "doc_id", "text", terms)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"))).toSet
    assert(hits === Set((2L, "ass"), (3L, "spam")))
    val kept = C4Clean.blocklistFilter(d, "doc_id", "text", terms)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(1L, 4L))
  }

  test("blocklist: plan broadcasts the terms side") {
    val s = spark; import s.implicits._
    val terms = Seq("x").toDF("term")
    val d = docs((1L, "a b c"))
    val plan = C4Clean.blocklistHits(d, "doc_id", "text", terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"terms join should broadcast:\n$plan")
  }
}
