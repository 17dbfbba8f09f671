package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring for target-distribution data selection
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling" — the method behind most public "pick the web data that
  * looks like my quality corpus" pipelines). Two feature LMs are
  * estimated — target distribution p and raw distribution q, over word
  * unigram+bigram features with Laplace smoothing on the shared
  * vocabulary — and each raw document is scored by its importance
  * log-weight sum_f n_f · [log p(f) − log q(f)]; selection keeps the
  * top-k. Extension beyond the reference (SURVEY.md §2.8 north star).
  *
  * Cross-engine exactness: the same integer-bit quantization as
  * [[NgramLm]] (log2 is transcendental, float sums reorder) —
  *
  *   bits(f) = bitlen(c_t(f)+1) − bitlen(c_r(f)+1)
  *   score   = Σ_f n_f·bits(f) + N_doc·[bitlen(T_r+V) − bitlen(T_t+V)]
  *
  * with bitlen(n) = `length(bin(n))`, exact in any engine; each term is
  * within ±1 bit of the true log ratio, the error bound uniform and
  * disclosed; per-doc totals are BIGINT sums, and the one final
  * division to bits/feature is a single IEEE double op.
  *
  * Scale design (the 100 TB contract):
  *  - features leave the document as 128-bit FINGERPRINTS (the
  *    [[LineDedup]] two-draw scheme — text never keys a shuffle);
  *  - [[score]] (exact features) joins doc-feature counts to a
  *    vocabulary-sized model on the fingerprint — a hash join both
  *    sides partial-aggregate map-side; right when the model fits the
  *    cluster but not one executor;
  *  - [[scoreHashed]] is the paper's production form: features hashed
  *    into B buckets (10^4 in the paper), so the model is EXACTLY B
  *    rows regardless of vocabulary — broadcast to every executor, the
  *    doc stream is never shuffled on the feature at all. The price is
  *    bucket collisions mixing feature statistics; the spec measures
  *    top-k agreement against the exact scorer on the fixture.
  */
object Dsir {

  /** (id, feat): word unigrams + bigrams, lowered, whitespace-split.
    * The split is materialized as its own projection before the lambda
    * (the [[SpanDedup.windows]] per-element re-evaluation lesson). */
  private[ext] def features(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val ws = col("__graft_ws")
    docs.select(col(idCol),
        split(trim(lower(col(textCol))), TextStats.WsRun).as("__graft_ws"))
      .where(size(ws) >= 1 && !(size(ws) === 1 && element_at(ws, 1) === ""))
      .select(col(idCol), explode(concat(
        ws,
        when(size(ws) >= 2,
          transform(sequence(lit(1), size(ws) - 1),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
          .otherwise(array().cast("array<string>")))).as("feat"))
  }

  private def fp(c: Column): (Column, Column) =
    (xxhash64(c), xxhash64(lit("graft-dsir-2"), c))

  /** The two-distribution model over the UNION vocabulary:
    * (fp1, fp2, c_t, c_r) — one hash aggregate over both corpora with a
    * side flag; Laplace's +1 is applied at scoring time. */
  def model(target: DataFrame, raw: DataFrame, idCol: String,
            textCol: String): DataFrame = {
    val both = features(target, idCol, textCol).withColumn("__t", lit(1L))
      .unionByName(features(raw, idCol, textCol).withColumn("__t", lit(0L)))
    val (f1, f2) = fp(col("feat"))
    both.select(f1.as("fp1"), f2.as("fp2"), col("__t"))
      .groupBy("fp1", "fp2")
      .agg(sum("__t").as("c_t"), sum(lit(1L) - col("__t")).as("c_r"))
  }

  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  /** Per-raw-document importance score in integer bits:
    * (id, n_features, score_bits, bits_per_feature). Deterministic,
    * oracle-exact (see scoring formula above). */
  def score(target: DataFrame, raw: DataFrame, idCol: String,
            textCol: String): DataFrame = {
    val m = model(target, raw, idCol, textCol)
    val tot = m.agg(sum("c_t").as("tt"), sum("c_r").as("tr"),
      count(lit(1)).as("v"))
    val (f1, f2) = fp(col("feat"))
    val docF = features(raw, idCol, textCol)
      .select(col(idCol), f1.as("fp1"), f2.as("fp2"))
      .groupBy(col(idCol), col("fp1"), col("fp2"))
      .agg(count(lit(1)).as("n"))
    docF.join(m, Seq("fp1", "fp2")) // raw features are in the model by construction
      .withColumn("fb", bitlen(col("c_t") + 1L) - bitlen(col("c_r") + 1L))
      .groupBy(col(idCol))
      .agg(sum("n").as("n_features"), sum(col("n") * col("fb")).as("feat_bits"))
      .crossJoin(broadcast(tot)) // single-row scalar join
      .select(col(idCol), col("n_features"),
        (col("feat_bits") + col("n_features") *
          (bitlen(col("tr") + col("v")) - bitlen(col("tt") + col("v"))))
          .as("score_bits"))
      .withColumn("bits_per_feature",
        col("score_bits").cast("double") / col("n_features"))
  }

  /** Top-k selection by (score_bits DESC, id ASC) — the deterministic
    * resampling stand-in (the paper adds Gumbel noise; a fixed total
    * order keeps the gate exact and the operator reproducible). */
  def select(target: DataFrame, raw: DataFrame, idCol: String,
             textCol: String, k: Int): DataFrame =
    score(target, raw, idCol, textCol)
      .orderBy(col("score_bits").desc, col(idCol))
      .limit(k)

  /** The paper's hashed form: features bucketed to `buckets` rows via
    * pmod(fp1, B) — the model is B rows, broadcast; collisions mix
    * statistics (measured against [[score]] in the spec). */
  def scoreHashed(target: DataFrame, raw: DataFrame, idCol: String,
                  textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val b = lit(buckets.toLong)
    val bucketOf = pmod(xxhash64(col("feat")), b)
    val m = features(target, idCol, textCol).withColumn("__t", lit(1L))
      .unionByName(features(raw, idCol, textCol).withColumn("__t", lit(0L)))
      .select(bucketOf.as("bkt"), col("__t"))
      .groupBy("bkt")
      .agg(sum("__t").as("c_t"), sum(lit(1L) - col("__t")).as("c_r"))
    val tot = m.agg(sum("c_t").as("tt"), sum("c_r").as("tr"),
      count(lit(1)).as("v"))
    val docF = features(raw, idCol, textCol)
      .select(col(idCol), bucketOf.as("bkt"))
      .groupBy(col(idCol), col("bkt")).agg(count(lit(1)).as("n"))
    docF.join(broadcast(m), Seq("bkt"))
      .withColumn("fb", bitlen(col("c_t") + 1L) - bitlen(col("c_r") + 1L))
      .groupBy(col(idCol))
      .agg(sum("n").as("n_features"), sum(col("n") * col("fb")).as("feat_bits"))
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("n_features"),
        (col("feat_bits") + col("n_features") *
          (bitlen(col("tr") + col("v")) - bitlen(col("tt") + col("v"))))
          .as("score_bits"))
      .withColumn("bits_per_feature",
        col("score_bits").cast("double") / col("n_features"))
  }
}
