package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-based corpus sampling.
  *
  * Training-data pipelines must sample REPRODUCIBLY: the same document
  * set selected on every run, every task retry, and every repartition.
  * `rand()` gives none of that (Spark seeds it per partition, so a
  * repartition or a recomputed stage changes the sample); hashing the
  * record key gives all of it, plus consistent sampling across tables
  * that share the key.
  *
  * The hash is a Knuth multiplicative scramble reduced by a prime —
  * pure BIGINT arithmetic (exact in any engine, so a DuckDB oracle
  * reproduces the selection bit-for-bit), no engine-specific hash
  * function. Map-side only: a sample is a filter, never a shuffle.
  */
object Sampling {

  /** Scramble constants: Knuth's 2654435761 (golden-ratio multiplier)
    * mod the Mersenne-adjacent prime 1e9+7, bucketed into parts-per-
    * million. All intermediate values stay far inside Long range for
    * ids up to ~3.4e9; larger key spaces should pre-fold the key. */
  val Multiplier = 2654435761L
  val Prime = 1000000007L
  val Million = 1000000L

  /** Bucket in [0, 1e6) for a numeric key column — deterministic,
    * engine-reproducible. */
  def bucket(key: Column): Column =
    pmod(pmod(key.cast("long") * Multiplier, lit(Prime)), lit(Million))

  /** Keep ~`perMillion` ppm of rows, selected by key hash. The same key
    * is kept or dropped consistently everywhere. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          perMillion: Long): DataFrame = {
    require(perMillion >= 0 && perMillion <= Million,
      s"perMillion must be in [0, $Million]")
    df.where(bucket(col(keyCol)) < perMillion)
  }

  // -------------------------------------------- temperature mixture

  /** Temperature-based mixture reweighting — the T5/Gopher/Llama
    * data-mixing step: per-group (source, language, domain…) keep
    * rates so the expected sampled token count hits `budgetTokens`,
    * with group weights total_tokens^alpha. alpha < 1 up-samples
    * low-resource groups (the multilingual rebalancing everyone runs);
    * groups whose quota exceeds their size clamp at keep-everything.
    *
    * `alpha` ∈ {0.0, 0.5, 1.0} only — each has an INTEGER-EXACT weight
    * path (1, floor(sqrt(n)), n) so the rate table reproduces
    * bit-for-bit in any engine: sqrt is IEEE-correctly-rounded
    * everywhere (unlike pow, whose last-ulp rounding differs across
    * libm implementations — the reason arbitrary alpha is not
    * offered), and floor(sqrt(n)) equals the true integer sqrt for
    * n < ~2^52. Rates are integral ppm via BIGINT arithmetic
    * (truncating division; all operands positive, so Spark's `div`
    * and floor-division agree); keep budgetTokens·max(weight)·1e6
    * below 2^63 — pre-scale token counts to kilotokens beyond that.
    *
    * Input: one row per group with an integral `tokensCol`. Output:
    * input columns + `weight` + `rate_ppm`. The aggregate and the
    * scalar total are group-count-sized — broadcast territory. */
  def temperatureRates(grouped: DataFrame, tokensCol: String,
                       alpha: Double, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val weight = alpha match {
      case 0.0 => lit(1L)
      case 0.5 => floor(sqrt(col(tokensCol).cast("double"))).cast("long")
      case 1.0 => col(tokensCol).cast("long")
      case a => throw new IllegalArgumentException(
        s"alpha must be 0.0, 0.5 or 1.0 (integer-exact paths); got $a")
    }
    val w = grouped.withColumn("weight", weight)
    val tot = w.agg(sum(col("weight")).as("__wtot"))
    w.crossJoin(broadcast(tot)) // single-row scalar join
      .withColumn("rate_ppm",
        least(lit(Million),
          expr(s"(${budgetTokens}L * weight * ${Million}L) " +
            s"div (__wtot * $tokensCol)")))
      .drop("__wtot")
  }

  /** Exact-k stratified sample: the k rows of each group whose key
    * [[bucket]] ranks smallest (ties broken by the key itself) — "give
    * me exactly 20 docs per language/source for eval", deterministic
    * and engine-reproducible (a plain `row_number() <= k` window in
    * SQL). Skew-safe two-phase form (the [[UrlOps.capPerDomain]]
    * discipline — strata like language are FEW and HUGE, so a naive
    * per-group window would serialize each stratum into one task):
    * phase 1 ranks within (group, salt) and keeps each salt's top k,
    * bounding every group to k×salts survivors; phase 2 ranks those
    * exactly. Equivalent to the single window for any total order
    * because each true top-k element is within its own salt's top k.
    * The salt is a KEY hash (not `spark_partition_id` — a coalesced or
    * single-partition input would put every row in salt 0 and quietly
    * degrade phase 1 back to the naive one-task-per-stratum window),
    * so the spread holds regardless of input partitioning.
    *
    * `keyCol` must be UNIQUE per row (true for doc_id), or a
    * deterministic tiebreaker must be supplied via `tieCols`: with
    * duplicate keys the (bucket, key) order has ties, the two window
    * evaluations may order tied rows differently, and phase-1 pruning
    * can then drop a row the single-window form would keep —
    * nondeterministically. `tieCols` columns are appended ascending to
    * BOTH windows' ordering, restoring the total order the equivalence
    * proof needs.
    * Output: input columns + `sample_rank` (1-based within group). */
  def stratifiedK(df: DataFrame, keyCol: String, groupCol: String,
                  k: Int, salts: Int = 16,
                  tieCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1 && salts >= 1)
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(bucket(col(keyCol)).asc, col(keyCol).asc) ++
      tieCols.map(col(_).asc)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(keyCol)), lit(salts.toLong)).cast("int"))
    val local = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(ord: _*)
    val bounded = salted
      .withColumn("__lrk", row_number().over(local))
      .where(col("__lrk") <= k)
      .drop("__lrk", "__salt")
    val global = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    bounded
      .withColumn("sample_rank", row_number().over(global).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** Apply a [[temperatureRates]] table: broadcast-join the per-group
    * rates and keep rows whose key [[bucket]] falls under the group's
    * rate — map-side besides the broadcast, deterministic per key. */
  def temperatureSample(docs: DataFrame, keyCol: String, groupCol: String,
                        rates: DataFrame): DataFrame =
    docs.join(broadcast(rates.select(col(groupCol), col("rate_ppm"))),
        Seq(groupCol))
      .where(bucket(col(keyCol)) < col("rate_ppm"))
      .drop("rate_ppm")
}
