package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact phrase search: find every VERBATIM occurrence of a standing
  * set of n-word phrases across the corpus — the memorization /
  * attribution / contamination-triage tool (Lee et al. 2022 check
  * eval strings verbatim; takedown and attribution requests arrive as
  * literal quotes). Matching is whitespace-word exact after the same
  * lower+trim normalization the dedup family uses.
  *
  * Scale shape (the 100 TB contract):
  *  - the corpus side generates word w-grams ONLY at the distinct
  *    phrase lengths present in the query set (one projection per
  *    length, unioned — |lengths| is tiny for a standing set);
  *  - grams are reduced map-side to 128-bit fingerprints (the
  *    [[LineDedup]] two-draw scheme; gram TEXT never crosses a
  *    shuffle) and filtered by a BROADCAST semi-join against the
  *    phrase fingerprints BEFORE any shuffle — only matching grams
  *    leave the map side;
  *  - the only shuffle is the (phrase, doc) occurrence aggregate.
  *
  * The oracle matches gram TEXT directly (fingerprints are
  * Spark-internal), so a green hash additionally witnesses
  * fingerprint↔text agreement on the corpus — the [[LineDedup]]
  * discipline.
  */
object PhraseSearch {

  private def fp1(c: Column): Column = xxhash64(c)
  private def fp2(c: Column): Column = xxhash64(lit("graft-phrase-2"), c)

  /** Normalized word array (the dedup family's split). */
  private def wordsOf(c: Column): Column =
    split(trim(lower(c)), TextStats.WsRun)

  /** Positioned w-grams at one length: (idCol, pos, fp1, fp2); pos is
    * the 1-based word offset of the gram start. */
  private def gramsAt(docs: DataFrame, idCol: String, textCol: String,
                      len: Int): DataFrame = {
    val w = col("__graft_ws")
    val grams = when(size(w) >= len,
        transform(sequence(lit(0), size(w) - len),
          i => struct((i + 1).as("pos"),
            concat_ws(" ", slice(w, i + 1, lit(len))).as("gram"))))
      .otherwise(array().cast("array<struct<pos:int,gram:string>>"))
    docs
      .select(col(idCol), wordsOf(col(textCol)).as("__graft_ws"))
      .select(col(idCol), explode(grams).as("g"))
      .select(col(idCol), col("g.pos").cast("long").as("pos"),
        fp1(col("g.gram")).as("fp1"), fp2(col("g.gram")).as("fp2"))
  }

  /** Normalized phrase table: (phrase_id, phrase_norm, n_words, fp1,
    * fp2). Phrases that normalize to zero words are rejected. */
  private def normPhrases(phrases: DataFrame): DataFrame = {
    val w = wordsOf(col("phrase"))
    val norm = phrases.select(col("phrase_id"),
        concat_ws(" ", w).as("phrase_norm"),
        when(length(trim(col("phrase"))) === 0, lit(0))
          .otherwise(size(w)).cast("int").as("n_words"))
    norm.select(col("phrase_id"), col("phrase_norm"), col("n_words"),
      fp1(col("phrase_norm")).as("fp1"), fp2(col("phrase_norm")).as("fp2"))
  }

  /** Per-(phrase, doc) occurrence report: (phrase_id, idCol,
    * n_occurrences, first_pos) — one row per document containing the
    * phrase at least once. `phrases` is a (phrase_id, phrase) frame
    * (small — it is broadcast). */
  def phraseCounts(docs: DataFrame, idCol: String, textCol: String,
                   phrases: DataFrame): DataFrame = {
    val p = normPhrases(phrases)
    val lengths = p.select("n_words").distinct()
      .collect().map(_.getInt(0)).filter(_ >= 1).sorted // bounded planning collect
    require(lengths.nonEmpty, "need at least one non-empty phrase")
    val matched = lengths.map { len =>
      gramsAt(docs, idCol, textCol, len)
        // broadcast semi-filter before the shuffle; the phrase join
        // also carries phrase_id (several phrases may share a length,
        // distinct phrases have distinct fingerprints)
        .join(broadcast(p.where(col("n_words") === len)
          .select("phrase_id", "fp1", "fp2")), Seq("fp1", "fp2"))
    }.reduce(_.unionByName(_))
    matched.groupBy(col("phrase_id"), col(idCol))
      .agg(count(lit(1)).as("n_occurrences"), min("pos").as("first_pos"))
  }

  /** Per-phrase corpus rollup incl. zero-match phrases: (phrase_id,
    * phrase_norm, n_docs, n_occurrences). */
  def phraseStats(docs: DataFrame, idCol: String, textCol: String,
                  phrases: DataFrame): DataFrame = {
    val counts = phraseCounts(docs, idCol, textCol, phrases)
      .groupBy("phrase_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_occurrences").as("n_occurrences"))
    normPhrases(phrases).select("phrase_id", "phrase_norm")
      .join(counts, Seq("phrase_id"), "left")
      .select(col("phrase_id"), col("phrase_norm"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"))
  }
}
