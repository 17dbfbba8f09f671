package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive read parallelism for CPU-heavy pipelines over few fat
  * inputs (guide §2.5 "input skew": one huge unsplittable file — fix at
  * the source or repartition immediately after the read).
  *
  * The bench corpus ships as single-row-group parquet files, so a scan
  * plans ONE input split regardless of `maxPartitionBytes` — and every
  * downstream map-side operator (shingle explode, JSON parse, n-gram
  * aggregation) then runs single-threaded until the first exchange.
  * Measured on `llm_lm_score` (sf0.1, 8 cores): the gram-count stage was
  * a 7.0 s wall / 6.8 s cpu ONE-TASK stage; the whole query is
  * scan-stage-bound the same way across the llm/cdc families.
  *
  * [[widen]] repartitions a freshly-read source up to the session's
  * default parallelism ONLY when the planned scan has fewer partitions —
  * derived from the actual scan layout, never a constant, so at
  * production scale (any input with ≥ cores splits) it is a no-op and no
  * shuffle is added where the data is already parallel. The repartition
  * hashes on the table's primary key: deterministic under task retry
  * (unlike `rand()`-derived keys, SPARK-38388) with no
  * sort-before-repartition cost (keyless round-robin pays a local sort
  * per task for retry determinism — guide §2.5).
  */
object ScanParallelism {

  /** `df` hash-partitioned on `key` into `defaultParallelism` partitions
    * when the planned scan is narrower than that; `df` unchanged
    * otherwise. Results are identical either way — the key is a plain
    * deterministic column and every registered query's output carries a
    * total order or an aggregation. */
  def widen(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
