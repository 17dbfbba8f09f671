package graft.ext

import graft.functions.VectorExpressions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
  * hash every character k-gram, slide a window of `w` consecutive hashes,
  * and keep each window's minimum — guaranteeing that any shared
  * substring of length ≥ k+w-1 contributes at least one shared
  * fingerprint, while storing only ~2/(w+1) of all hashes.
  *
  * Scale shape: the whole computation is per-row array math inside one
  * projection (no shuffle at all until the caller aggregates or joins on
  * fingerprints); the fingerprint index (fp → doc) is the same
  * inverted-index currency as [[Dedup.jaccardPairs]]'s shingle index.
  * Hashes are Spark's xxhash64 → engine-specific values, so registry
  * checks are rows-only and the guarantees are asserted in scalatest.
  */
object Winnowing {

  /** Array of winnowed k-gram rolling-hash fingerprints for a text
    * column. Docs shorter than k+w-1 chars yield an empty array.
    *
    * Implemented as the codegen-layer kernel
    * [[graft.functions.WinnowFingerprint]]: a higher-order-function
    * formulation (`transform` windows over a `transform` gram array)
    * re-inlines the gram computation per window — O(n²·k) per doc,
    * measured 246 s on the 500-doc corpus vs <1 s for the O(n) rolling
    * kernel. */
  def fingerprintArray(text: Column, k: Int = 8, w: Int = 4): Column =
    VectorExpressions.winnowFingerprint(text, k, w)

  /** Exploded fingerprint index: (id, fingerprint) — the join currency
    * for plagiarism/near-dup detection over a corpus. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol),
      explode(fingerprintArray(col(textCol), k, w)).as("fingerprint"))

  /** Pairs of docs sharing at least `minShared` winnowed fingerprints —
    * substring-overlap candidates via the inverted index (never
    * all-pairs; same hot-key considerations as jaccardPairs' maxDf). */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String, textCol: String,
                             k: Int = 8, w: Int = 4,
                             minShared: Long = 2,
                             maxDf: Long = Long.MaxValue): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, k, w)
    val filtered =
      if (maxDf == Long.MaxValue) fps
      else {
        // Window count, not agg+join-back (the jaccardPairs lesson: the
        // join-back re-scans and re-shuffles the full stream; the window
        // shares the one shuffle the self-join below needs anyway).
        import org.apache.spark.sql.expressions.Window
        fps.withColumn("__df",
            count(lit(1)).over(Window.partitionBy("fingerprint")))
          .where(col("__df") <= maxDf)
          .select(col(idCol), col("fingerprint"))
      }
    val a = filtered.select(col(idCol).as("id_a"), col("fingerprint"))
    val b = filtered.select(col(idCol).as("id_b"), col("fingerprint"))
    a.join(b, "fingerprint")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
