package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-ops audit between two versions of a
  * corpus (monthly crawl refreshes, re-filtered releases): which
  * documents were added, removed, changed, or carried unchanged.
  * Dataset release notes (Dolma, FineWeb version bumps) are exactly
  * this table rolled up.
  *
  * Scale shape: each side is reduced MAP-SIDE to (id, 32-byte content
  * digest) — document text never crosses the shuffle, so the diff of
  * two 100 TB snapshots moves only ~50 bytes/doc — then one full-outer
  * id-keyed join classifies every id. Status from digest comparison is
  * identical to status from text comparison (SHA-256 collisions aside),
  * which is what lets the DuckDB oracle restate the classification by
  * comparing the text directly.
  */
object SnapshotDiff {

  /** Per-id status between `oldDf` and `newDf`:
    * added (new only), removed (old only), changed (digest differs),
    * unchanged. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    // coalesce BEFORE digesting: a null-text row must read as a present
    // row with empty content, not as an absent id (sha2(null) is null,
    // and null h_old is this join's presence signal)
    val o = oldDf.select(col(idCol),
      sha2(coalesce(col(textCol), lit("")), 256).as("h_old"))
    val n = newDf.select(col(idCol),
      sha2(coalesce(col(textCol), lit("")), 256).as("h_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Release-notes rollup: doc count per status. */
  def diffStats(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
}
