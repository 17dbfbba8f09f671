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
}
