package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * word/token counting, quality scoring, and a lightweight language-ID
  * heuristic. All are pure Catalyst column expressions (no UDFs), so they
  * stay inside whole-stage codegen and scale as narrow map-side work —
  * the only shuffles are whatever aggregation the caller adds on top.
  *
  * These extend the reference's surface (it has no text operators); they
  * are the north-star ops named in SURVEY.md §2.8 / BASELINE.json.
  */
object TextStats {

  /** RE2's `\s` class spelled out literally: `[\t\n\f\r ]`. Spark
    * regexes are Java, whose `\s` ALSO matches vertical tab (\x0B);
    * DuckDB's RE2 `\s` does not — writing Java `\s` here would
    * silently diverge from the oracle on any document containing \x0B
    * (the same trap [[graft.functions.RepetitionStats]] documents for
    * its kernel). Every Column-level whitespace class in this module
    * and [[Dedup.shingles]] must use these, never `\s`. */
  private[ext] val WsChars = " \\t\\n\\f\\r"
  private[ext] val WsRun = s"[$WsChars]+"

  /** Whitespace word-split (empty-trimmed). */
  def words(text: Column): Column = split(trim(text), WsRun)

  def nWords(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(words(text)))

  /** BPE-ish tokenization: letter runs, digit runs, single punctuation.
    * Same regex dialect subset works in Java (Spark) and RE2 (DuckDB);
    * the whitespace class is [[WsChars]], not `\s` (see there). */
  val TokenRe = s"[A-Za-z]+|[0-9]+|[^A-Za-z0-9$WsChars]"

  def tokens(text: Column): Column = regexp_extract_all(text, lit(TokenRe), lit(0))

  def nTokens(text: Column): Column = size(tokens(text))

  /** Gopher-style repetition quality signals, one kernel pass per doc
    * (see [[graft.functions.RepetitionStats]]): word/bigram frequency
    * counters plus the two derived fractions real corpus filters
    * threshold on (duplicate-word fraction, top-bigram fraction —
    * heavily repetitive docs are boilerplate or generation loops). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rs = graft.functions.VectorExpressions.repetitionStats(col(textCol))
    // null text → all-zero counters, matching the oracle's LEFT JOIN +
    // coalesce convention (and the empty-string case)
    def stat(i: Int) = coalesce(element_at(col("__rs"), i), lit(0L))
    df.select(col(idCol), rs.as("__rs"))
      .select(
        col(idCol),
        stat(1).as("n_words"),
        stat(2).as("top_word_count"),
        stat(3).as("repeated_words"),
        stat(4).as("n_bigrams"),
        stat(5).as("top_bigram_count"))
      .withColumn("repeated_word_fraction",
        round(col("repeated_words").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 6))
      .withColumn("top_bigram_fraction",
        round(col("top_bigram_count").cast("double") /
          greatest(col("n_bigrams"), lit(1L)).cast("double"), 6))
  }

  /** Stopword list used by the quality score and language ID (kept tiny
    * and explicit so the DuckDB oracle can restate it verbatim). */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Ratio of stopwords to words, 6-decimal-rounded (rounding keeps the
    * value oracle-comparable across engines). */
  def stopwordRatio(text: Column): Column = {
    val w = words(text)
    val hits = size(filter(w, t => t.isin(EnStopwords.map(lit): _*)))
    round(hits.cast("double") / greatest(size(w), lit(1)).cast("double"), 6)
  }

  /** Mean word length (quality signal: gibberish skews high/low). */
  def meanWordLen(text: Column): Column = {
    val w = words(text)
    val total = aggregate(w, lit(0L), (acc, x) => acc + length(x).cast("long"))
    round(total.cast("double") / greatest(size(w), lit(1)).cast("double"), 6)
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column = {
    val p = length(regexp_replace(text, s"[A-Za-z0-9$WsChars]", ""))
    round(p.cast("double") / greatest(length(text), lit(1)).cast("double"), 6)
  }

  /** Composite quality score in [0,1]: long-enough docs with normal word
    * shape and low punctuation score high. Deterministic arithmetic only.
    * NOT rounded: the inputs are already 6-decimal-rounded and the
    * remaining ops are bit-identical IEEE doubles in any engine, whereas
    * a final round can disagree across engines at .5 boundaries (Spark
    * rounds the exact binary expansion, DuckDB rounds x*1e6 — observed
    * divergent on real data). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val wordScore = lit(1.0) -
      least(abs(meanWordLen(text) - lit(5.0)) / lit(5.0), lit(1.0))
    lenScore * 0.4 + punctScore * 0.3 + wordScore * 0.3
  }

  /** Language markers for the n-gram-free language-ID heuristic. Marker
    * hits are counted per language; argmax wins, ties broken by the fixed
    * language order below ('unk' when nothing matches). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "con"),
    "fr" -> Seq("le", "la", "et", "est", "avec"),
  )

  def langId(text: Column): Column = {
    val w = words(lower(text))
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(w, t => t.isin(markers.map(lit): _*)))
    }
    // argmax with first-listed language winning ties (strict > on later)
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          greatest(score, bestScore))
    }
    when(best._2 > 0, best._1).otherwise(lit("unk"))
  }

  /** Character trigrams (positions 1..n-2 of the lowercased text) — the
    * currency of the classic n-gram language-ID profile method. The
    * lowered text is BOUND once via a singleton-array lambda variable:
    * an expression captured inside a higher-order-function body is
    * re-evaluated per element (`lower` would copy the string once per
    * trigram — O(len²) per doc), while a lambda VARIABLE is evaluated
    * once when the outer array is built. (Contrast the winnowing
    * lesson — a transform-of-transform whose INNER COLLECTION is
    * captured in the outer lambda re-inlines per outer element; a
    * one-element outer binding is the opposite shape.) */
  def charTrigrams(text: Column): Column =
    flatten(transform(array(lower(text)), t =>
      when(length(t) >= 3,
          transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))))

  /** Signature character trigrams per language (frequent-trigram
    * profiles; the classic Cavnar-Trenkle shape with a tiny fixed
    * profile so the DuckDB oracle can restate it verbatim). */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he ", " th", "ing", "and"),
    "es" -> Seq("de ", " de", "la ", "os ", "ión"),
    "fr" -> Seq("le ", " le", "es ", "ent", "que"),
  )

  /** N-gram language ID: count profile-trigram hits per language over
    * the doc's char trigrams; argmax wins with first-listed language
    * breaking ties; 'unk' when no profile hits.
    *
    * Hit counting runs in the single-pass
    * [[graft.functions.NgramProfileCount]] kernel — the per-language
    * `filter`-over-`transform` form re-inlines the trigram array per
    * language (measured 28 s vs ~1 s over the 5000-doc corpus). */
  def langIdNgram(text: Column): Column = {
    val counts = graft.functions.VectorExpressions.ngramProfileCount(
      text, TrigramProfiles.map(_._2))
    val scores = TrigramProfiles.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          greatest(score, bestScore))
    }
    when(best._2 > 0, best._1).otherwise(lit("unk"))
  }

  /** Top-k characteristic terms per document by a tf-idf-style score.
    *
    * Score = tf · N / df — LINEAR inverse document frequency rather than
    * the textbook log: the ordering within a document is identical for
    * any monotone idf transform, and avoiding `ln` keeps the score a
    * pure IEEE int-ratio computation that DuckDB reproduces bit-for-bit
    * (libm log implementations are not cross-engine reproducible).
    *
    * Scale shape: two hash aggregates (tf on (doc, term), df on term —
    * both map-side partial) and one join of tf against the term
    * dictionary (df), which is vocabulary-sized, not corpus-sized; the
    * corpus count N is a 1-row broadcast. Ties rank deterministically by
    * term. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col(idCol), explode(words(lower(col(textCol)))).as("term"))
      .where(col("term") =!= "")
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(count_distinct(col(idCol)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") * col("__n") / col("df"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Cleaning pass: collapse whitespace runs to single spaces and trim —
    * the first stage of any pretraining text pipeline. Pure codegen'd
    * regexp, map-side. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(text, WsRun, " "))

  /** Corpus vocabulary statistics: occurrence total, distinct terms,
    * hapax legomena (terms in exactly one document), and the widest
    * document frequency — the health numbers a corpus build reports.
    * Two hash aggregates (term dictionary, then a 1-row fold). */
  def vocabStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(words(lower(col(textCol)))).as("term"))
      .where(col("term") =!= "")
    terms.groupBy("term")
      .agg(count(lit(1)).as("tf"), count_distinct(col(idCol)).as("df"))
      .agg(
        sum(col("tf")).as("n_occurrences"),
        count(lit(1)).as("n_distinct_terms"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax_docfreq"),
        max(col("df")).as("max_df"))
  }

  /** Per-language corpus stats (doc counts + exact integer char/word
    * totals, division-free so the oracle compare is exact). */
  def perLangStats(documents: DataFrame): DataFrame =
    documents.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(nWords(col("text")).cast("long")).as("total_words"),
    ).orderBy("lang")

  /** Vocabulary coverage curve — the tokenizer-design question "how
    * much of the corpus do the top-N word types cover?" (Zipf
    * accounting): the `topN` most frequent lowercased whitespace words
    * with rank, frequency, and CUMULATIVE coverage in integer ppm
    * (`cum·10^6 div total` — exact in any engine).
    *
    * Scale shape: one word-count aggregation (vocabulary-sized, hash
    * partial), then `orderBy(...).limit(topN)` — Spark's distributed
    * take-ordered, NEVER a full-vocabulary sort to one partition — and
    * the running sum windows over only the topN survivors (bounded
    * rows). The grand total rides a single-row scalar join. */
  def vocabCoverage(documents: DataFrame, textCol: String,
      topN: Int): DataFrame = {
    require(topN >= 1)
    import org.apache.spark.sql.expressions.Window
    val freqs = documents
      .select(explode(filter(words(lower(col(textCol))), t => t =!= ""))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val total = freqs.agg(sum("freq").as("__tot"))
    val top = freqs.orderBy(col("freq").desc, col("term")).limit(topN)
    val w = Window.orderBy(col("freq").desc, col("term"))
    // cum·10^6 in Long wraps SILENTLY once the cumulative count passes
    // ~9.2e12 words — inside this module's 100 TB design point, and
    // worse than DuckDB (whose BIGINT overflow ERRORS). The in-plan
    // guard (the exactCosinePairs raise_error discipline) makes both
    // engines fail loudly at the same line; past it, pre-scale counts
    // to kilotokens (the temperatureRates rule).
    val cumCap = 9000000000000L // 9e12: cum*1e6 stays under 2^63
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum("freq").over(w))
      .crossJoin(broadcast(total)) // single-row scalar join
      .select(col("rank"), col("term"), col("freq").cast("long").as("freq"),
        when(col("__cum") > cumCap, raise_error(format_string(
          "vocabCoverage: cumulative count %d exceeds the exact-ppm " +
            "Long bound %d — pre-scale counts to kilotokens",
          col("__cum"), lit(cumCap))).cast("long"))
          .otherwise(expr("(__cum * 1000000L) div __tot")).as("cum_ppm"))
  }
}
