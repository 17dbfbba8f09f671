package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality classification — the FineWeb-Edu / DCLM-style
  * filter: distill a cheap heuristic gate (or any labeled seed set)
  * into a token-level Naive-Bayes classifier, then score every
  * document under the learned model. Extension beyond the reference
  * (SURVEY.md §2.8 north star); the production pattern is Penedo et
  * al. 2024 (FineWeb) and Li et al. 2024 (DCLM), who train a fastText
  * /linear classifier on a curated seed vs. random crawl and keep the
  * classifier-positive head of the corpus.
  *
  * The model: multinomial Naive Bayes over lowered whitespace word
  * tokens with add-one smoothing, one count row per (token, class):
  *   P(t | c) = (C_c(t) + 1) / (T_c + V)
  * where T_c = total token occurrences in class c and V = vocabulary
  * size (distinct tokens across both classes). A document's score is
  * the log-likelihood-ratio  Σ_t n_t · (−log2 P(t|neg) + log2 P(t|pos))
  * — positive means the document reads more like the positive class.
  *
  * Cross-engine exactness: the same integer-bit quantization as
  * [[NgramLm]] — per-token class cost
  *   bits_c(t) = bitlen(T_c + V) − bitlen(C_c(t) + 1)
  * with bitlen(n) = floor(log2 n) + 1 exact in any engine (`bin()` in
  * Spark, `format('{:b}', n)` in DuckDB), so the per-doc score is a
  * BIGINT sum of integers, order-free and bit-identical across engines.
  * Class priors are deliberately excluded (uniform-prior likelihood
  * ratio): a per-doc constant never changes the ranking, and the
  * decision threshold is a knob callers tune anyway.
  *
  * Scale design (the 100 TB contract):
  *  - training is ONE vocabulary-bounded hash aggregate over the token
  *    stream — map-side partial aggregation collapses each task to at
  *    most |vocab| rows, so the shuffle is bounded by the VOCABULARY,
  *    not the corpus; totals and V derive from the count table itself
  *    (three scalar aggregates over vocab rows, no second corpus scan);
  *  - scoring joins per-document token COUNTS (one doc-keyed aggregate)
  *    to the broadcast model — the document stream is never shuffled on
  *    the token, and unseen tokens cost bitlen(T_c + V) via the add-one
  *    coalesce, so out-of-corpus text scores without special casing;
  *  - counts are a MONOID: per-epoch partials sum to a full retrain
  *    (see [[IncrementalNaiveBayes]]), the property that makes the
  *    filter maintainable against a growing corpus without rereads.
  */
object NaiveBayes {

  /** Lowered whitespace tokens with empty strings dropped (the empty
    * string `split` yields on blank input is not a word). */
  private[ext] def tokens(text: Column): Column =
    filter(split(trim(lower(text)), TextStats.WsRun), t => t =!= "")

  /** The trained model: per-token class counts. Totals and vocabulary
    * size are DERIVED from this one table (vocab-bounded scalar aggs),
    * so it is the only thing a caller persists. */
  case class Model(tok: DataFrame) {
    /** Single-row (t_pos, t_neg, v) totals frame, broadcast at score
      * time. */
    def totals: DataFrame =
      tok.agg(sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"),
        count(lit(1)).as("v"))
  }

  /** Train on a labeled corpus: `labelCol` is a boolean column (true =
    * positive class). One token-keyed aggregate, vocab-bounded. */
  def train(docs: DataFrame, textCol: String, labelCol: String): Model =
    Model(docs
      .select(col(labelCol).as("__graft_lab"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("__graft_lab"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("__graft_lab"), 0L).otherwise(1L)).as("c_neg")))

  /** Per-document integer-bit log-likelihood-ratio under the model:
    * (idCol, n_tokens, score_bits, predicted), one row per doc with at
    * least one token. `predicted` = score_bits > 0 (more probable under
    * the positive class at uniform prior). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    // per-doc token counts: ONE doc-keyed shuffle with map-side combine
    val docTok = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))
    val joined = docTok
      .join(broadcast(model.tok), Seq("tok"), "left")
      .crossJoin(broadcast(model.totals)) // single row
      .withColumn("bits_pos",
        (length(bin(col("t_pos") + col("v"))) -
          length(bin(coalesce(col("c_pos"), lit(0L)) + 1))).cast("long"))
      .withColumn("bits_neg",
        (length(bin(col("t_neg") + col("v"))) -
          length(bin(coalesce(col("c_neg"), lit(0L)) + 1))).cast("long"))
    joined.groupBy(col(idCol))
      .agg(sum("n").as("n_tokens"),
        sum(col("n") * (col("bits_neg") - col("bits_pos")))
          .as("score_bits"))
      .select(col(idCol), col("n_tokens"), col("score_bits"),
        (col("score_bits") > 0).as("predicted"))
  }
}
