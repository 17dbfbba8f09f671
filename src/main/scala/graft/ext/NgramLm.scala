package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram language-model quality scoring — the CCNet-style
  * perplexity filter (Wenzek et al. 2020: score each document under an
  * n-gram LM, rank, keep the low-perplexity head). Extension beyond the
  * reference (SURVEY.md §2.8 north star).
  *
  * The model is a char-TRIGRAM LM with add-one (Laplace) smoothing
  * trained on a reference corpus: P(c3 | c1c2) = (C(c1c2c3) + 1) /
  * (C(c1c2) + V), V = the reference charset size. A document's score is
  * its total cross-entropy in bits; low bits/char ≈ fluent under the
  * reference distribution, high ≈ junk — the ranking CCNet thresholds.
  *
  * Cross-engine exactness: log2 is a transcendental (engines differ in
  * the last ulp) and per-doc float SUMS are accumulation-order-dependent
  * — both would break a bit-identical oracle. The per-trigram cost is
  * therefore QUANTIZED TO WHOLE BITS with pure integer arithmetic:
  *
  *   bits(t) = bitlen(C(ctx) + V) − bitlen(C(t) + 1)
  *
  * where bitlen(n) = floor(log2(n)) + 1 is the binary-string length of
  * a positive integer — exact in any engine (`bin()` in Spark,
  * `format('{:b}', n)` in DuckDB). Since p = (C(t)+1)/(C(ctx)+V),
  * bits(t) is within ±1 of −log2(p), an error bound that is uniform and
  * disclosed; the per-doc TOTAL is a BIGINT sum (order-free), and the
  * single final division to bits/trigram is one IEEE double op, which
  * is bit-identical across engines.
  *
  * Scale design (the 100 TB contract):
  *  - the model is ONE hash aggregate over the combined 3/2/1-gram
  *    stream (gram length identifies the table) — map-side partial
  *    aggregation collapses each task's stream to at most |charset|³
  *    rows, so the shuffle is bounded by the CHARSET, not the corpus
  *    (a 100-symbol charset caps the model at 1M rows), and training
  *    reads the corpus exactly once;
  *  - scoring joins the model to per-document trigram COUNTS (computed
  *    with one doc-keyed aggregate), and the model side is broadcast —
  *    the document stream is never shuffled on the trigram;
  *  - per-doc totals reuse the (doc, trigram) aggregate's partitioning.
  */
object NgramLm {

  /** 1-based char n-gram array over an already-materialized lowered
    * text ATTRIBUTE — the caller must project `lower(text)` first: an
    * expression captured inside a higher-order-function lambda is
    * re-evaluated per element (lower() would copy the string once per
    * gram — O(len²) per doc), an attribute reference reads the row
    * buffer. Spaces kept (they carry word-boundary signal, as in
    * CCNet's SentencePiece stream). */
  private def charGrams(t: Column, n: Int): Column =
    when(length(t) >= n,
        transform(sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** The trained model: trigram counts, context-bigram counts, and the
    * reference CHARSET (distinct characters, not a pre-aggregated size
    * — the set form is what incremental epoch unions need; see
    * [[IncrementalNgramLm]]). Three tiny charset-bounded DataFrames a
    * caller may persist. */
  case class Model(tri: DataFrame, big: DataFrame, charset: DataFrame)

  /** One corpus pass trains all three tables (was three passes, one per
    * gram length — guide §2.3/§2.4: one scan + one exchange instead of
    * three of each). The 3/2/1-grams ride a single explode into one
    * charset-bounded aggregate; a gram's LENGTH identifies its table
    * (substr windows are exactly n chars), so the combined counts split
    * back exactly — per-(n, gram) counts are identical to the per-pass
    * form, and `lower(text)` is now evaluated once per doc, not three
    * times. Map-side partial aggregation bounds the shuffle by
    * |charset|³ + |charset|² + |charset|, never the corpus.
    *
    * The combined counts are STAGED (lineage-truncating materialize,
    * [[graft.util.Checkpoints]]) before the three per-length filters:
    * a length filter on the grouping key pushes BELOW the aggregate,
    * so without the barrier each Model table would re-run the full
    * combined explode — measured 3.9 → 6.0 s on `llm_lm_score` when
    * this was left to ReusedExchange. The staged table is
    * charset-bounded (tiny at any corpus size), so the checkpoint
    * costs one small job and every consumer reads it for free. */
  def train(ref: DataFrame, textCol: String): Model = {
    val t = col("__graft_t")
    val counts = graft.util.Checkpoints.stage(
      ref.select(lower(col(textCol)).as("__graft_t"))
        .select(explode(concat(
          charGrams(t, 3), charGrams(t, 2), charGrams(t, 1))).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt")))
    Model(
      tri = counts.where(length(col("gram")) === 3)
        .select(col("gram"), col("cnt").as("c3")),
      big = counts.where(length(col("gram")) === 2)
        .select(col("gram"), col("cnt").as("c2")),
      charset = counts.where(length(col("gram")) === 1).select("gram"))
  }

  /** Per-document integer-bit cross-entropy under the model:
    * (idCol, n_trigrams, total_bits, bits_per_trigram), one row per doc
    * that has at least one trigram. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    // per-doc trigram counts: ONE doc-keyed shuffle with map-side combine
    val docTri = docs
      .select(col(idCol), lower(col(textCol)).as("__graft_t"))
      .select(col(idCol), explode(charGrams(col("__graft_t"), 3)).as("tri"))
      .groupBy(col(idCol), col("tri")).agg(count(lit(1)).as("n"))
    // model joins are broadcast (model rows bounded by charset size);
    // every doc trigram exists in the model when scoring the training
    // corpus itself — for out-of-corpus text an unseen trigram has
    // C(t)=0 and an unseen context C(ctx)=0, handled by the coalesce.
    val joined = docTri
      .join(broadcast(model.tri.withColumnRenamed("gram", "tri")),
        Seq("tri"), "left")
      .join(broadcast(model.big.withColumnRenamed("gram", "ctx")),
        substring(col("tri"), 1, 2) === col("ctx"), "left")
      .crossJoin(broadcast(
        model.charset.agg(count(lit(1)).as("v_chars")))) // single row
      .withColumn("bits",
        (length(bin(coalesce(col("c2"), lit(0L)) + col("v_chars"))) -
          length(bin(coalesce(col("c3"), lit(0L)) + 1))).cast("long"))
    joined.groupBy(col(idCol))
      .agg(sum("n").as("n_trigrams"),
        sum(col("n") * col("bits")).as("total_bits"))
      .select(col(idCol), col("n_trigrams"), col("total_bits"),
        (col("total_bits").cast("double") / col("n_trigrams"))
          .as("bits_per_trigram"))
  }

  /** Self-scored corpus (model trained on `docs` itself — the common
    * bootstrap when no external reference corpus exists). */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    score(docs, idCol, textCol, train(docs, textCol))
}
