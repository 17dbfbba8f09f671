package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffled join hashes rows to partitions BY KEY, so one pathological
  * key (the null-ish user, the default tenant) lands every matching row
  * of the large side in one task. AQE's skew-join splitting handles
  * sort-merge cases automatically — PREFER IT (it needs no code) — but
  * it cannot split a hash-aggregated build side or help a
  * `groupBy(key)` feeding the join. Salting is the explicit fallback:
  * the large side spreads each key over `salts` sub-keys using a
  * DETERMINISTIC scramble of a row-unique column (never `rand()` — a
  * task retry would re-salt differently and lose/duplicate rows), and
  * the small side is replicated `salts`× so every sub-key still finds
  * its match. Join cardinality and results are unchanged; the hot key's
  * work fans out over `salts` tasks at the cost of replicating the
  * small side.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `key`, spreading each large-side key
    * over `salts` partitions. `rowId` must be row-unique on the large
    * side (a primary key) so the salt is deterministic under retries. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 rowId: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "need at least one salt")
    // Right/full outer would emit every unmatched SMALL row once per
    // salt replica — silently wrong cardinality. Only join types whose
    // unmatched-row semantics live on the large (salted) side are sound.
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(ok(joinType.toLowerCase.replace("_", "")) ||
        ok(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType " +
        "(the replicated small side would duplicate unmatched rows)")
    val salted = large.withColumn("__salt",
      pmod(Sampling.bucket(col(rowId)), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
