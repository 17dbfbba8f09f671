package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle into training shards — the terminal
  * "shuffle before training" step every pretraining pipeline runs
  * (examples must reach the trainer in decorrelated order; shard files
  * must be balanced so data-parallel readers stay in step).
  *
  * The naive formulations both fail at 100 TB: `ORDER BY rand()` is a
  * full global sort on an unstable key (a task retry reshuffles its
  * partition — runs are irreproducible), and a global `row_number()`
  * is a single-partition window. Here the shuffle is a seeded affine
  * PERMUTATION of the key space: `skey = (A·id + B) mod P` with P the
  * Mersenne prime 2^31−1 and A in [1,P) — injective over [0,P), so
  * every document gets a UNIQUE pseudorandom position with no sort and
  * no randomness. Shards are RANGE slices of the key space (uniformly
  * occupied, so balanced in expectation), and the within-shard order is
  * a rank over `skey` — a window PARTITIONED BY shard, so the whole op
  * is one hash shuffle plus per-shard sorts that spill independently;
  * nothing single-partition (spec-asserted against the physical plan).
  *
  * Everything is exact BIGINT arithmetic (A·id + B < 2^62 for id < P),
  * so a DuckDB oracle reproduces the permutation bit-for-bit
  * (`llm_shuffle_shards` / `llm_shuffle_stats`). Ids outside [0, P)
  * would collide mod P and silently break injectivity — the expression
  * raises in-plan instead (the [[Similarity]] guard discipline); key
  * spaces beyond 2^31 pre-fold ids into [0, P) first and accept the
  * documented collision rate, or renumber via `zipWithIndex`-style
  * dense ids upstream.
  */
object ShardShuffle {

  /** Mersenne prime 2^31 − 1: the permutation's modulus. */
  val P = 2147483647L

  /** Seed-derived affine constants: A in [1, P−1] (any nonzero residue
    * is invertible mod a prime, so the map is a permutation), B in
    * [0, P−1]. Two independent golden-ratio scrambles of the seed so
    * adjacent seeds land on unrelated (A, B). */
  def affineConsts(seed: Long): (Long, Long) = {
    val a = Math.floorMod(seed * Sampling.Multiplier, P - 1) + 1
    val b = Math.floorMod((seed + 0x9e3779b9L) * Sampling.Multiplier, P)
    (a, b)
  }

  /** The permuted key for an id column — injective on [0, P); raises
    * in-plan on out-of-range ids rather than silently colliding. */
  def permKey(id: Column, seed: Long): Column = {
    val (a, b) = affineConsts(seed)
    val idL = id.cast("long")
    when(idL < 0L || idL >= P,
      raise_error(concat(lit(s"ShardShuffle: id outside [0, $P): "),
        idL.cast("string"))))
      .otherwise(pmod(idL * lit(a) + lit(b), lit(P)))
  }

  /** Shuffle `df` into `nShards` balanced shards: adds
    * (shard, pos_in_shard) — shard = range slice of the permuted key
    * space, pos_in_shard = 0-based rank within the shard. Same rows +
    * same seed → identical layout on any engine, cluster size, or
    * retry. */
  def shuffleToShards(df: DataFrame, idCol: String, nShards: Int,
                      seed: Long): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val q = (P + nShards - 1) / nShards
    val w = Window.partitionBy("shard").orderBy("skey")
    df.withColumn("skey", permKey(col(idCol), seed))
      .withColumn("shard", expr(s"skey DIV $q").cast("int"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long") - 1)
  }

  /** Per-shard balance/contiguity audit: n_docs plus min/max position
    * (0 and n_docs−1 iff the shard's ranks are contiguous) and the
    * id sum binding shard membership to content. */
  def shardStats(df: DataFrame, idCol: String, nShards: Int,
                 seed: Long): DataFrame =
    shuffleToShards(df, idCol, nShards, seed)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("pos_in_shard").as("min_pos"),
        max("pos_in_shard").as("max_pos"),
        sum(col(idCol)).as("id_sum"))
}
