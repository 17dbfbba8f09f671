package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over the corpus — the inverted-index ranking
  * step a training-data build runs for corpus exploration, benchmark-
  * similarity triage, and as the lexical side of hybrid (lexical +
  * embedding) retrieval. Extension beyond the reference (SURVEY.md §2.8
  * north star); Robertson & Zaragoza 2009 is the public formulation.
  *
  * Cross-engine exactness — the house integer discipline: BM25's
  * textbook form needs `ln` (idf) and a float division per (doc, term),
  * both of which diverge across engines (libm logs in the last ulp,
  * per-doc float sums under reordering). Every quantity here is instead
  * BIGINT end to end:
  *
  *   dl_ratio = (1000 · dl · N) DIV T            -- milli-scaled dl/avgdl
  *   idf      = min((1000 · (N+1)) DIV (df+1), 10^7)
  *   tfc      = min(tf, 10^4)
  *   part     = (idf · 44000 · tfc) DIV (20000·tfc + 6000 + 18·dl_ratio)
  *   score_u  = Σ_terms part                      -- BIGINT, order-free
  *
  * `part` is the BM25 saturation kernel tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  * at the standard k1=1.2, b=0.75, with numerator and denominator
  * multiplied through by 20000 so the constants are exact integers
  * (44000 = 20000·2.2; 20000·tf; 6000 = 20000·0.3; 18·dl_ratio =
  * 20000·0.9·dl_ratio/1000). The idf is the LINEAR smoothed inverse
  * document frequency (N+1)/(df+1) — the same disclosed trade
  * [[TextStats.tfIdfTopTerms]] makes: monotone in the Lucene
  * log(1+(N−df+0.5)/(df+0.5)) idf, never zero/negative, and free of
  * transcendentals, at the cost of weighting rare terms more heavily
  * relative to the log form when partials are summed. The two clamps
  * bound every intermediate below 2^63 at ANY corpus size (idf saturates
  * for terms rarer than ~1/10^4 of docs, tf saturates at 10^4 — past the
  * BM25 saturation knee anyway) and are applied identically by the
  * DuckDB oracle.
  *
  * Scale shape (the 100 TB contract):
  *  - tokens are FILTERED TO THE QUERY TERMS before any shuffle — the
  *    only corpus-sized aggregate is (doc, term) tf over query-matching
  *    tokens, with map-side combine; the full vocabulary is never built;
  *  - per-doc length dl rides the token stream from the same projection
  *    (no join back to the corpus);
  *  - df and the (N, T) corpus stats are a ≤|Q|-row and a 1-row
  *    broadcast respectively;
  *  - top-k is TakeOrderedAndProject (per-partition heaps + driver
  *    merge), never a global sort.
  */
object Bm25 {

  /** Per-(doc, term) BM25 partials over a (idCol, term, tf, dl) stream
    * plus a broadcastable (term, df) frame and the 1-row (n_docs,
    * total_tokens) corpus stats — the arithmetic every serving path
    * shares verbatim. */
  private[ext] def parts(tf: DataFrame, dfreq: DataFrame,
                         stats: DataFrame): DataFrame =
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats)) // single-row scalar join
      .withColumn("dl_ratio", expr("(1000 * dl * n_docs) DIV total_tokens"))
      .withColumn("idf",
        least(expr("(1000 * (n_docs + 1)) DIV (df + 1)"), lit(10000000L)))
      .withColumn("tfc", least(col("tf"), lit(10000L)))
      .withColumn("part",
        expr("(idf * 44000 * tfc) DIV (20000 * tfc + 6000 + 18 * dl_ratio)"))

  /** The integer scoring kernel (per-doc fold of [[parts]]) — shared
    * verbatim by the direct path and the [[IncrementalBm25]] index
    * probe, so the index round-trip cannot diverge arithmetically. */
  private[ext] def kernel(tf: DataFrame, idCol: String,
                          dfreq: DataFrame, stats: DataFrame): DataFrame =
    parts(tf, dfreq, stats)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum("part").as("score_u"))

  /** (score DESC, id ASC) top-k with a 1-based rank: the heavy
    * selection is `orderBy.limit(k)` (TakeOrderedAndProject); the rank
    * window runs over the k surviving rows only. */
  private[ext] def rankTopK(scored: DataFrame, idCol: String,
                            k: Int): DataFrame =
    scored.orderBy(col("score_u").desc, col(idCol).asc).limit(k)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("score_u").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("n_terms"), col("score_u"), col("rank"))

  /** Per-document BM25 scores for `queryTerms` (docs matching at least
    * one term): (idCol, n_terms, score_u). Terms are matched on the
    * whitespace-lowered word stream ([[TextStats.words]]). */
  def scores(docs: DataFrame, idCol: String, textCol: String,
             queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val base = docs.select(col(idCol),
      TextStats.nWords(col(textCol)).cast("long").as("dl"),
      TextStats.words(lower(col(textCol))).as("__w"))
    // N and T: one 1-row fold, broadcast inside the kernel.
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_tokens"))
    // filter BEFORE the shuffle: only query-matching tokens leave the map
    val qtok = base
      .select(col(idCol), col("dl"), explode(col("__w")).as("term"))
      .where(col("term").isin(queryTerms: _*))
    val tf = qtok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    // df per query term: ≤ |Q| rows (count over (doc, term) = distinct docs)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    kernel(tf, idCol, dfreq, stats)
  }

  /** Top-k by (score_u DESC, id ASC) with a 1-based rank. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    rankTopK(scores(docs, idCol, textCol, queryTerms), idCol, k)
  }

  /** BATCH retrieval: top-k per query for a whole standing-query table
    * (query_id, term) in ONE corpus pass — the shape a benchmark-triage
    * or decontamination job actually runs (hundreds of probe queries,
    * one scan). Per-(doc, term) partials are computed ONCE over the
    * UNION of all query terms and fanned out to queries by a broadcast
    * join, so Q queries sharing terms cost one tf aggregate, not Q;
    * per-query ranking is a query-partitioned window (parallel across
    * queries, never SinglePartition). df is the corpus document
    * frequency — identical to the single-query path, so a term scores
    * the same in every query. Duplicate (query_id, term) rows are
    * collapsed. Returns (query_id, idCol, n_terms, score_u, rank),
    * rank ≤ k per query. */
  def topKMany(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val qt = queries.select(col("query_id"), col("term"))
      .dropDuplicates("query_id", "term")
    val terms = qt.select("term").distinct()
    val base = docs.select(col(idCol),
      TextStats.nWords(col(textCol)).cast("long").as("dl"),
      TextStats.words(lower(col(textCol))).as("__w"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_tokens"))
    // filter BEFORE the shuffle, via the broadcast union-term set
    val qtok = base
      .select(col(idCol), col("dl"), explode(col("__w")).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
    val tf = qtok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val perQuery = parts(tf, dfreq, stats)
      .join(broadcast(qt), "term") // fan out to queries sharing the term
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum("part").as("score_u"))
    perQuery.withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("score_u").desc, col(idCol).asc)).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("n_terms"),
        col("score_u"), col("rank"))
  }

  /** Linear tf·idf ranking over the same query terms — the second
    * lexical ranking [[rrfFuse]] fuses with BM25 (no length
    * normalization, so it orders differently from BM25 on this corpus).
    * Same integer discipline: score_u = Σ tf·idf, BIGINT. */
  def tfIdfScores(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val qtok = docs
      .select(col(idCol),
        explode(TextStats.words(lower(col(textCol)))).as("term"))
      .where(col("term").isin(queryTerms: _*))
    val tf = qtok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), "term").crossJoin(broadcast(n))
      .withColumn("idf",
        least(expr("(1000 * (n_docs + 1)) DIV (df + 1)"), lit(10000000L)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("least(tf, 10000) * idf")).as("score_u"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR'09) of ranked lists:
    * rrf(d) = Σ_lists 10^9 DIV (60 + rank_list(d)) — integer-exact, so
    * the fused order is engine-reproducible. Fusion runs over the
    * TOP-`poolK` of each list only (the standard hybrid-retrieval form:
    * each ranker contributes a bounded candidate pool, so fusing costs
    * O(poolK · lists) regardless of corpus size), then keeps the top
    * `k` by (rrf_u DESC, id ASC).
    *
    * Inputs are (id, ..., score_u) frames; each is ranked here by
    * (score_u DESC, id ASC). The rank windows run over `poolK`-bounded
    * frames (post-limit), never the corpus. */
  def rrfFuse(idCol: String, poolK: Int, k: Int,
              lists: Seq[(String, DataFrame)]): DataFrame = {
    require(lists.nonEmpty && poolK >= 1 && k >= 1, "need lists and positive k")
    val ranked = lists.map { case (name, df) =>
      df.orderBy(col("score_u").desc, col(idCol).asc).limit(poolK)
        .withColumn(s"rank_$name",
          row_number().over(
            Window.orderBy(col("score_u").desc, col(idCol).asc)).cast("long"))
        .select(col(idCol), col(s"rank_$name"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = lists.map { case (name, _) =>
      coalesce(expr(s"1000000000 DIV (60 + rank_${name})"), lit(0L))
    }.reduce(_ + _)
    joined.withColumn("rrf_u", rrf)
      .orderBy(col("rrf_u").desc, col(idCol).asc).limit(k)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("rrf_u").desc, col(idCol).asc)).cast("long"))
  }
}
