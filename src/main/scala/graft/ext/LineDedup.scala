package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document LINE-level exact deduplication — the CCNet/Dolma
  * boilerplate pass: hash every line of every document, count how many
  * distinct documents each (normalized) line appears in corpus-wide,
  * and rewrite documents with the offending lines removed. Web corpora
  * are full of navigation chrome, cookie banners, and license headers
  * that repeat VERBATIM across millions of pages; CCNet (Wenzek et al.
  * 2020) dedups by line hash before any model-based filtering, and
  * Dolma ships the same pass. Sibling of [[SpanDedup]] (which finds
  * repeated spans at arbitrary offsets; this pass is cheaper and
  * catches the aligned-line case web text mostly is) — extension beyond
  * the reference (SURVEY.md §2.8 north star).
  *
  * Scale design (the 100 TB contract):
  *  - the unit of shuffle for the frequency count is a 128-bit line
  *    FINGERPRINT (two independent xxhash64 draws — the [[SpanDedup]]
  *    argument, same collision bound ~n²/2^129), never the line text;
  *    the count is a hash AGGREGATE (partial aggregation collapses a
  *    hot boilerplate line map-side) and the join-back of its few
  *    offending rows is AQE-skew-splittable;
  *  - reassembly is one groupBy(doc) over the KEPT lines — state
  *    bounded by a document's own line count, the text bytes shuffle
  *    exactly once (they must: the output is the rewritten corpus);
  *  - the drop DECISION table (fingerprint → df) is tiny relative to
  *    the corpus (distinct lines ≪ total lines on boilerplate-heavy
  *    web data) and carries no text.
  *
  * Lines are matched on a NORMALIZED form (trim + lowercase — CCNet
  * additionally strips digits; pass a pre-normalized column for that)
  * but documents are reassembled from the ORIGINAL line text.
  */
object LineDedup {

  /** (id, line_idx, line): split on a separator regex, 1-based index,
    * empty lines dropped (they carry no content and every engine agrees
    * on nothing about trailing-separator behavior). Map-side. */
  def lines(docs: DataFrame, idCol: String, textCol: String,
            sepRe: String = "\n"): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), sepRe)).as(Seq("__i", "line")))
      .where(trim(col("line")) =!= "")
      .select(col(idCol), (col("__i") + 1).cast("long").as("line_idx"),
        col("line"))

  /** Fixture adapter for single-line corpora: non-overlapping `w`-word
    * chunks as "lines" (the `documents` table has no newlines; a
    * chunking segmentation exercises the identical dedup machinery).
    * The split is materialized as its own projection before the lambda
    * — an expression captured inside a higher-order-function body is
    * re-evaluated PER ELEMENT (the [[SpanDedup.windows]] lesson). */
  def chunkLines(docs: DataFrame, idCol: String, textCol: String,
                 w: Int): DataFrame = {
    require(w >= 1, s"chunk width must be >= 1, got $w")
    val wsc = col("__graft_ws")
    docs.select(col(idCol),
        split(trim(lower(col(textCol))), TextStats.WsRun).as("__graft_ws"))
      .where(size(wsc) >= 1 && !(size(wsc) === 1 && element_at(wsc, 1) === ""))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), floor((size(wsc) - 1) / w).cast("int")),
          i => concat_ws(" ", slice(wsc, i * w + 1, lit(w))))).as(Seq("__i", "line")))
      .select(col(idCol), (col("__i") + 1).cast("long").as("line_idx"),
        col("line"))
  }

  private[ext] def fingerprinted(lines: DataFrame): DataFrame = {
    val norm = trim(lower(col("line")))
    lines.withColumn("fp1", xxhash64(norm))
      .withColumn("fp2", xxhash64(lit("graft-line-2"), norm))
  }

  /** Per-line corpus frequency: (fp1, fp2, df, n_occ) — df counts
    * DISTINCT documents (a page that repeats its own nav bar is not
    * boilerplate evidence), n_occ total occurrences. One hash agg. */
  def lineDf(lines: DataFrame, idCol: String): DataFrame =
    fingerprinted(lines).groupBy("fp1", "fp2")
      .agg(count_distinct(col(idCol)).as("df"),
        count(lit(1)).as("n_occ"))

  /** Rewrite each document with every line that appears in >= `minDocs`
    * DISTINCT documents removed — the CCNet boilerplate drop. Keeps a
    * row for every input document (a fully-boilerplate page survives
    * with empty text and its drop count — the operator wants to SEE
    * those). Output: (id, text, n_kept, n_dropped). */
  def dropBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                      lines: DataFrame, minDocs: Int,
                      sep: String = " "): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val hot = lineDf(lines, idCol).where(col("df") >= minDocs)
      .select("fp1", "fp2")
    val flagged = fingerprinted(lines)
      .join(hot.withColumn("__drop", lit(true)), Seq("fp1", "fp2"), "left")
    reassemble(docs, idCol, flagged, sep)
  }

  /** Global exact line dedup: every occurrence of a repeated line is
    * dropped EXCEPT the first (ordered by (id, line_idx)) — the
    * strictest form, used when downstream training must never see the
    * same line twice. Decision = one min-aggregate per fingerprint
    * (min of a packed (id, line_idx) struct), joined back. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 lines: DataFrame, sep: String = " "): DataFrame = {
    val fp = fingerprinted(lines)
    val first = fp.groupBy("fp1", "fp2")
      .agg(min(struct(col(idCol), col("line_idx"))).as("__first"))
    val flagged = fp.join(first, Seq("fp1", "fp2"))
      .withColumn("__drop",
        col("__first")(idCol) =!= col(idCol) ||
          col("__first")("line_idx") =!= col("line_idx"))
      .withColumn("__drop", when(col("__drop"), lit(true)))
      .drop("__first")
    reassemble(docs, idCol, flagged, sep)
  }

  /** (id, text, n_kept, n_dropped) from flagged lines (`__drop` true =
    * remove); every input doc keeps a row (left join), dropped-to-empty
    * docs get text ''. */
  private[ext] def reassemble(docs: DataFrame, idCol: String,
                              flagged: DataFrame, sep: String): DataFrame = {
    val folded = flagged.groupBy(idCol).agg(
      coalesce(array_join(transform(
        array_sort(collect_list(when(col("__drop").isNull,
          struct(col("line_idx"), col("line"))))),
        s => s("line")), sep), lit("")).as("text"),
      sum(when(col("__drop").isNull, 1L).otherwise(0L)).as("n_kept"),
      sum(when(col("__drop").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
    docs.select(col(idCol)).distinct()
      .join(folded, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** One-row corpus audit: total / distinct / boilerplate lines and the
    * occurrence mass a `minDocs` drop would remove — the number an
    * operator reads before committing a corpus-wide rewrite. */
  def stats(lines: DataFrame, idCol: String, minDocs: Int): DataFrame = {
    val df = lineDf(lines, idCol)
    df.agg(
      sum(col("n_occ")).as("n_lines"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("df") >= minDocs, 1L).otherwise(0L)).as("n_boilerplate"),
      sum(when(col("df") >= minDocs, col("n_occ")).otherwise(0L))
        .as("occ_dropped"),
      max(col("df")).as("max_df"))
  }
}
