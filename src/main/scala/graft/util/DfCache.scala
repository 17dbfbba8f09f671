package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persisted-DataFrame cache keyed by (session, sfDir,
  * name) — the one implementation of the compute-then-putIfAbsent race
  * rule used by every shared query-side cache ([[graft.queries]]):
  * `getOrElseUpdate`'s thunk is not atomic, so the loser of a
  * concurrent first-compute race must unpersist its copy and adopt the
  * winner's, or the orphaned persist leaks executor memory for the JVM
  * lifetime. Values are session-bound DataFrames, so entries must be
  * dropped (`clear()`) whenever the harness calls
  * `spark.catalog.clearCache()` — a cleared Spark cache does NOT
  * re-register plans this map would otherwise keep serving. */
final class DfCache {
  private val m = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  def apply(key: String, spark: SparkSession, sfDir: String)
           (mk: => DataFrame): DataFrame =
    m.get((spark, sfDir, key)) match {
      case Some(df) => df
      case None =>
        val df = mk.persist()
        m.putIfAbsent((spark, sfDir, key), df) match {
          case Some(winner) => df.unpersist(); winner
          case None         => df
        }
    }

  def clear(): Unit = m.clear()
}
