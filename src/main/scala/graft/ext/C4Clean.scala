package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic page cleaning (Raffel et al. 2020, the rules that
  * produced the Colossal Clean Crawled Corpus) plus token-exact
  * blocklist filtering — the step a web-crawl pipeline runs between
  * HTML extraction ([[Warc.extractText]]) and dedup/quality scoring.
  * Extends the reference's surface (SURVEY.md §2.8 north star).
  *
  * Scale shape: [[clean]] is a single map-side projection — the line
  * split, per-line predicates, and reassembly all happen inside one
  * higher-order-function chain with NO shuffle and no UDF, so it rides
  * whole-stage codegen and scales embarrassingly at 100 TB.
  * [[blocklistHits]] shuffles tokens only to the distinct-doc
  * aggregate; the blocklist side is a broadcast join (blocklists are
  * thousands of terms, never corpus-scale).
  */
object C4Clean {

  /** C4's line-keep predicates, applied to a trimmed line:
    *  1. ends in a terminal punctuation mark (. ! ? ");
    *  2. has at least `minWordsPerLine` whitespace words;
    *  3. does not mention "javascript" (case-insensitive).
    * The whitespace class is [[TextStats.WsChars]] (RE2/Java-portable,
    * see there). */
  private def lineKept(l: Column, minWordsPerLine: Int): Column = {
    val lt = trim(l)
    lt.rlike("[.!?\"]$") &&
      size(split(lt, TextStats.WsRun)) >= minWordsPerLine &&
      !contains(lower(lt), lit("javascript"))
  }

  /** C4 page cleaning: drops pages containing "lorem ipsum" or a curly
    * brace, keeps only lines passing [[lineKept]], and drops pages with
    * fewer than `minLines` surviving lines (C4 uses 5 sentences; the
    * knob is exposed because the registered fixture's docs are short).
    * Output: (id, clean_text, n_lines_kept, n_lines_in) for surviving
    * pages — clean_text is the kept lines re-joined with '\n'. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minWordsPerLine: Int = 3, minLines: Int = 5): DataFrame = {
    val lines = split(col(textCol), "\n")
    // The split is materialized as its own projection before the HOF
    // filter consumes it (the [[Dedup.shingles]] lesson: an expression
    // captured in a lambda re-evaluates per element; an attribute
    // reference reads the row buffer).
    docs
      .where(!contains(lower(col(textCol)), lit("lorem ipsum")) &&
        !contains(col(textCol), lit("{")))
      .select(col(idCol), col(textCol), lines.as("__lines"))
      .select(col(idCol),
        filter(col("__lines"), l => lineKept(l, minWordsPerLine)).as("__kept"),
        size(col("__lines")).cast("long").as("n_lines_in"))
      .where(size(col("__kept")) >= minLines)
      .select(col(idCol),
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__kept")).cast("long").as("n_lines_kept"),
        col("n_lines_in"))
  }

  /** One-row corpus audit of [[clean]]: how many pages the marker rules
    * killed, how many fell under the min-line floor, and the line-level
    * keep ratio over surviving pages — the numbers an operator reads
    * before committing a crawl snapshot to the cleaned corpus. */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            minWordsPerLine: Int = 3, minLines: Int = 5): DataFrame = {
    val lines = split(col(textCol), "\n")
    val marker = contains(lower(col(textCol)), lit("lorem ipsum")) ||
      contains(col(textCol), lit("{"))
    val perDoc = docs
      .select(col(idCol), marker.as("__marker"), lines.as("__lines"))
      .select(col(idCol), col("__marker"),
        size(col("__lines")).cast("long").as("__n_in"),
        when(col("__marker"), lit(0L)).otherwise(
          size(filter(col("__lines"),
            l => lineKept(l, minWordsPerLine))).cast("long")).as("__n_kept"))
    perDoc.agg(
      count(lit(1)).as("docs_in"),
      sum(when(col("__marker"), 1L).otherwise(0L)).as("docs_dropped_marker"),
      sum(when(!col("__marker") && col("__n_kept") < minLines, 1L)
        .otherwise(0L)).as("docs_dropped_minlines"),
      sum(when(!col("__marker") && col("__n_kept") >= minLines, 1L)
        .otherwise(0L)).as("docs_kept"),
      sum(when(!col("__marker") && col("__n_kept") >= minLines,
        col("__n_in")).otherwise(0L)).as("lines_in_kept_docs"),
      sum(when(!col("__marker") && col("__n_kept") >= minLines,
        col("__n_kept")).otherwise(0L)).as("lines_kept"))
  }

  // ------------------------------------------------------------ blocklist

  /** Per-doc blocklist hits: docs whose lowercased whitespace TOKEN set
    * intersects `terms` (a one-column DataFrame of lowercase terms).
    * Token-exact, not substring — "class" never matches a blocklist
    * entry "ass" (the classic C4 blocklist false-positive), because the
    * match is an equality join on whole words.
    *
    * Returns (id, term) distinct pairs. The terms side is broadcast
    * (auto at blocklist sizes; the hint makes it explicit), so the only
    * shuffle is the distinct aggregate — no skew risk because a
    * stopword-like blocklist term fans out map-side and the distinct is
    * (id, term)-keyed. */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
                    terms: DataFrame): DataFrame = {
    val termCol = terms.columns.head
    val toks = docs.select(col(idCol),
        explode(split(trim(lower(col(textCol))), TextStats.WsRun)).as("__tok"))
      .where(col("__tok") =!= "")
    toks.join(broadcast(terms.select(lower(col(termCol)).as("__tok"),
        lower(col(termCol)).as("term"))), "__tok")
      .select(col(idCol), col("term")).distinct()
  }

  /** The blocklist page filter itself: `docs` minus every page with at
    * least one blocklist hit — one anti-join against the bounded hit
    * set. */
  def blocklistFilter(docs: DataFrame, idCol: String, textCol: String,
                      terms: DataFrame): DataFrame =
    docs.join(blocklistHits(docs, idCol, textCol, terms)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
