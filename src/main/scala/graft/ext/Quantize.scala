package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/serving pass of
  * an embedding pipeline (4× smaller vectors for the ANN index, with a
  * measurable reconstruction error).
  *
  * Determinism contract for the oracle: quantized codes use `floor`,
  * never `round` — floor is identical in every engine while
  * half-rounding rules differ (Spark HALF_UP on the decimal expansion
  * vs DuckDB on x·10^d) — and all the arithmetic is elementwise IEEE
  * double with fixed evaluation order. Map-side only, no shuffle; the
  * per-element lambdas are Catalyst higher-order functions, acceptable
  * here because quantization is O(dim) per row with no candidate
  * blowup (the kernel-worthy hot paths are the pairwise ones).
  */
object Quantize {

  /** Per-vector symmetric scale: max |x| (0 for the all-zero vector). */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec.cast("array<double>"), x => abs(x)))

  /** int8 codes: floor(x · 127 / maxabs); all-zero vectors map to zeros.
    * Codes are in [-128, 127] (floor of the -127..127 range). */
  def int8Codes(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val mx = maxAbs(v)
    when(mx === 0.0, transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => floor(x * lit(127.0) / mx).cast("long")))
  }

  /** Worst-element reconstruction error |x − code·maxabs/127|. */
  def maxReconstructionError(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val mx = maxAbs(v)
    when(mx === 0.0, lit(0.0)).otherwise(
      array_max(zip_with(v, int8Codes(vec),
        (x, q) => abs(x - q.cast("double") * mx / lit(127.0)))))
  }

  /** Quantization audit table: per-vector scale, code checksum, and the
    * worst reconstruction error (bounded by maxabs/127 — asserted in
    * the spec and implied by floor's ±1 code error). maxAbs and the
    * code array are materialized once as intermediate columns —
    * Catalyst does not reliably dedupe repeated higher-order-function
    * subtrees, and inlining them re-runs the O(dim) lambdas per use. */
  def stats(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("max_abs", maxAbs(col("__v")))
      .withColumn("__codes",
        when(col("max_abs") === 0.0, transform(col("__v"), _ => lit(0L)))
          .otherwise(transform(col("__v"),
            x => floor(x * lit(127.0) / col("max_abs")).cast("long"))))
      .select(
        col(idCol),
        col("max_abs"),
        aggregate(col("__codes"), lit(0L), (acc, q) => acc + q).as("code_sum"),
        when(col("max_abs") === 0.0, lit(0.0)).otherwise(
          array_max(zip_with(col("__v"), col("__codes"),
            (x, q) => abs(x - q.cast("double") * col("max_abs") / lit(127.0)))))
          .as("max_err"))
}
