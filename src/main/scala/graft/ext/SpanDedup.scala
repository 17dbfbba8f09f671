package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring (span-level) deduplication: find every fixed-length
  * word window that occurs more than once ANYWHERE in the corpus (across
  * documents or repeated inside one), and merge the hits per document
  * into maximal duplicated spans — the operation of Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", where the
  * dedup unit is the repeated SPAN, not the whole document (doc-level
  * near-dup keeps a document that embeds a verbatim copied passage;
  * span-level finds the passage). Extension beyond the reference
  * (SURVEY.md §2.8 north star), sibling of [[Dedup]].
  *
  * Scale design (the 100 TB contract):
  *  - the unit of shuffle is a 128-bit window FINGERPRINT (two
  *    independent xxhash64 draws), never the window text: a w-word
  *    window is ~100 bytes and every word position emits one, so
  *    shuffling texts multiplies the corpus bytes by ~w while the
  *    fingerprint stream is a flat 16 bytes/position. Lee et al. dedup
  *    from suffix-array matches; the Spark-native equivalent of "exact
  *    content equality" over fingerprints is exact up to a 128-bit
  *    collision — p ≈ n²/2^129, ~1e-14 even at 10^12 windows — and a
  *    fixture-scale parity spec pins the fingerprint path to the
  *    text-grouped result.
  *  - occurrence counting is a hash AGGREGATE + join-back, not a window
  *    function over the fingerprint: partial aggregation collapses a
  *    degenerate hot window (repeated boilerplate) map-side, and the
  *    join-back of its single count row is AQE-skew-splittable, where a
  *    `count over (partition by fp)` would pin every occurrence of the
  *    hot window on one task. (Contrast `Dedup.cappedShingles`, which
  *    picks the window form because ITS shuffle is reused by the
  *    inverted-index self-join; here the downstream partitioning is
  *    doc_id, so nothing would be reused.)
  *  - span merging is per-document window functions — one shuffle on
  *    doc_id, state bounded by a document's own window count.
  */
object SpanDedup {

  /** (doc_id, pos, fp1, fp2) for every w-word window; pos is the
    * 1-based word index of the window start (DuckDB-slice convention,
    * so `pos` aligns with `ws[pos : pos+w-1]` in the oracle). */
  private[ext] def windows(docs: DataFrame, idCol: String, textCol: String,
                           w: Int, keepText: Boolean = false): DataFrame = {
    // TextStats.WsRun, not Java \s: oracle splits with RE2 \s (see
    // Dedup.shingles — same parity requirement). The split is
    // MATERIALIZED as its own projection before the lambda: an
    // expression captured inside a higher-order-function body is
    // re-evaluated PER ELEMENT (regex split × every window — measured
    // ~2× on this query), while an attribute reference is computed once
    // per row. CollapseProject keeps the boundary because `__graft_ws` is
    // referenced more than once above it.
    val wsc = col("__graft_ws")
    val wins = when(size(wsc) >= w,
        transform(
          sequence(lit(1), size(wsc) - w + 1),
          i => struct(i.as("pos"),
            concat_ws(" ", slice(wsc, i, lit(w))).as("gram"))))
      .otherwise(array().cast("array<struct<pos:int,gram:string>>"))
    val base = docs
      .select(col(idCol),
        split(trim(lower(col(textCol))), TextStats.WsRun).as("__graft_ws"))
      .select(col(idCol), explode(wins).as("win"))
      .select(col(idCol), col("win.pos").cast("long").as("pos"),
        col("win.gram").as("gram"))
    val fp = base.select(col(idCol), col("pos"),
      xxhash64(col("gram")).as("fp1"),
      // a second INDEPENDENT draw: different input bytes (salt column),
      // so fp2 is not a function of fp1
      xxhash64(lit("graft-span-2"), col("gram")).as("fp2"),
      col("gram"))
    if (keepText) fp else fp.drop("gram")
  }

  /** Window occurrences that appear >= minCount times in the corpus:
    * (doc_id, pos). */
  private def duplicatedPositions(docs: DataFrame, idCol: String,
                                  textCol: String, w: Int,
                                  minCount: Long): DataFrame = {
    val win = windows(docs, idCol, textCol, w)
    val counts = win.groupBy("fp1", "fp2")
      .agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= minCount)
      .select("fp1", "fp2")
    win.join(counts, Seq("fp1", "fp2")).select(col(idCol), col("pos"))
  }

  /** Island merge shared by every span producer: duplicated window
    * starts (idCol, pos) → maximal spans. Per doc ordered by pos, a new
    * island starts when the gap to the previous duplicated window start
    * exceeds w (the windows no longer overlap or touch); span bounds
    * are the island's min pos and max pos + w - 1. One doc-keyed
    * shuffle, state bounded by a document's own window count. */
  private[ext] def mergeSpans(hits: DataFrame, idCol: String,
                              w: Int): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    val marked = hits.withColumn("brk",
      when(col("pos") - lag("pos", 1).over(byDoc) <= w, lit(0L))
        .otherwise(lit(1L)))
    val islands = marked.withColumn("island", sum("brk").over(byDoc))
    islands.groupBy(col(idCol), col("island"))
      .agg(min("pos").as("span_start"),
        (max("pos") + (w - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"))
  }

  /** Maximal duplicated spans per document: overlapping or adjacent
    * duplicated windows [p, p+w) merge into one span. Output
    * (idCol, span_start, span_end, span_words) in 1-based inclusive
    * word indexes. */
  def spans(docs: DataFrame, idCol: String, textCol: String, w: Int,
            minCount: Long = 2L): DataFrame =
    mergeSpans(duplicatedPositions(docs, idCol, textCol, w, minCount),
      idCol, w)

  /** Corpus-level summary a pipeline operator reads before deciding to
    * cut spans: affected docs, span count, duplicated word mass vs the
    * corpus total. One row. */
  def stats(docs: DataFrame, idCol: String, textCol: String, w: Int,
            minCount: Long = 2L): DataFrame = {
    val sp = spans(docs, idCol, textCol, w, minCount)
    val ws = split(trim(lower(col(textCol))), TextStats.WsRun)
    val totals = docs.select(
      count(lit(1)).as("n_docs"),
      sum(size(ws).cast("long")).as("total_words"))
    sp.select(
        countDistinct(col(idCol)).as("docs_affected"),
        count(lit(1)).as("n_spans"),
        sum("span_words").as("dup_words"))
      .crossJoin(totals) // both sides single-row aggregates
      .select(col("n_docs"), col("total_words"), col("docs_affected"),
        col("n_spans"), col("dup_words"),
        (col("dup_words").cast("double") / col("total_words"))
          .as("dup_fraction"))
  }

  /** The dedup REWRITE (Lee et al. 2022 §3: drop every occurrence of a
    * duplicated span except one): a word position is cut when some
    * duplicated window covers it and NO SURVIVING window occurrence
    * does. The survivor of each window group is its lexicographically
    * first occurrence, min (doc_id, pos) — deterministic under retries
    * and engine-independent. Output per doc:
    * (idCol, n_words, n_cut, text_dedup) with the kept words rejoined
    * in order.
    *
    * Scale notes: the per-position coverage explode is w rows per
    * DUPLICATED window occurrence (bounded by the duplicate mass, not
    * the corpus); the rebuild groups by doc with a sort_array over the
    * doc's own words — state bounded by document length, the same bound
    * any text transform carries. */
  def cut(docs: DataFrame, idCol: String, textCol: String, w: Int,
          minCount: Long = 2L): DataFrame = {
    val win = windows(docs, idCol, textCol, w)
    // survivor per duplicated window group: lexicographic min of
    // (doc_id, pos) via a struct MIN — one aggregate, map-side partial
    val groups = win.groupBy("fp1", "fp2")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col(idCol), col("pos"))).as("surv"))
      .where(col("n_occ") >= minCount)
      .select(col("fp1"), col("fp2"),
        col(s"surv.$idCol").as("surv_doc"), col("surv.pos").as("surv_pos"))
    val hits = win.join(groups, Seq("fp1", "fp2"))
      .select(col(idCol), col("pos"),
        (col(idCol) === col("surv_doc") && col("pos") === col("surv_pos"))
          .as("is_surv"))
    // per word position: covered by a surviving occurrence?
    val cover = hits
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (w - 1)))
        .as("j"), col("is_surv"))
      .groupBy(col(idCol), col("j"))
      .agg(max("is_surv").as("surv_cover"))
    val ws = split(trim(lower(col(textCol))), TextStats.WsRun)
    val words = docs
      .select(col(idCol), posexplode(ws).as(Seq("j0", "word")))
      .select(col(idCol), (col("j0") + 1).cast("long").as("j"), col("word"))
    val kept = words.join(cover, Seq(idCol, "j"), "left")
      .withColumn("keep", coalesce(col("surv_cover"), lit(true)))
    kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_cut"),
        concat_ws(" ",
          transform(
            sort_array(collect_list(when(col("keep"),
              struct(col("j"), col("word"))))),
            s => s.getField("word"))).as("text_dedup"))
      .select(col(idCol), col("n_words"), col("n_cut"), col("text_dedup"))
  }

  /** Text-grouped twin of the fingerprint path, used ONLY by the parity
    * spec: identical output unless a 128-bit fingerprint collision
    * occurred. Never on the scale path — it shuffles full window texts. */
  private[ext] def spansByText(docs: DataFrame, idCol: String,
                               textCol: String, w: Int,
                               minCount: Long = 2L): DataFrame = {
    val win = windows(docs, idCol, textCol, w, keepText = true)
    val counts = win.groupBy("gram").agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= minCount).select("gram")
    val hits = win.join(counts, Seq("gram")).select(col(idCol), col("pos"))
    mergeSpans(hits, idCol, w)
  }
}
