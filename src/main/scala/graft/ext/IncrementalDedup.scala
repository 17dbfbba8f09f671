package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental append-batch near-duplicate detection against a
  * PERSISTED shingle index — the production shape for a corpus that
  * ingests a new shard daily and asks "which NEW docs duplicate the
  * EXISTING corpus?" without recomputing the full n-gram self-join.
  *
  * Contract (the `llm_dedup_incremental` oracle proves it): the output
  * equals [[Dedup.jaccardPairs]] over `old ∪ new` — including the
  * combined-corpus document-frequency cap — RESTRICTED to pairs with at
  * least one new-batch side. The subtlety is the df cap: appending a
  * batch can push a shingle's combined df over `maxDf`, which removes
  * it from BOTH sides' capped shingle sets and changes old docs'
  * capped sizes. The index stores enough (per-shingle df, per-doc
  * capped counts) to reproduce the combined cap exactly without
  * rescanning old text.
  *
  * Scale shape (the "|new|, not |corpus|" guarantee):
  *  - the only index-sized work is ONE column-pruned scan of each index
  *    table, filtered MAP-SIDE by a broadcast of the new batch's
  *    distinct shingles (a daily shard is MBs-GBs; eval/bench shards
  *    far less) — the index is never shuffled;
  *  - rows surviving those map-side filters are bounded by
  *    |new shingles| × maxDf (the df cap is also the hot-bucket bound),
  *    so every shuffle/join downstream scales with the batch, not the
  *    corpus;
  *  - at 100 TB, write the `shingles/` table bucketed by `shingle` and
  *    the scan's IO prunes too; appending the verified batch back into
  *    the index (shingles ∪ newly-computed, df re-merged) is the same
  *    one-pass shape.
  */
object IncrementalDedup {

  /** Build the persisted index for `docs` at `path`:
    *  - `shingles/` (doc_id, shingle, df): every distinct word-n-gram
    *    per doc with its corpus document frequency denormalized in, so
    *    the incremental pass caps map-side with no df join;
    *  - `df/` (shingle, df): the distinct-shingle frequency table (the
    *    column-pruned lookup for new-batch shingles absent from any
    *    surviving `shingles/` row);
    *  - `sizes/` (doc_id, n_sh): per-doc shingle count under the
    *    BUILD-TIME cap (adjusted, not recomputed, at query time);
    *  - `meta/` (n, max_df, n_docs): the parameters queries must agree
    *    on.
    * One shuffle on shingle (the df aggregate + join-back), once, at
    * build time. */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 path: String, n: Int = 3,
                 maxDf: Long = Long.MaxValue): Unit = {
    val spark = docs.sparkSession
    val sh = Dedup.shingles(docs, idCol, textCol, n)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val shWithDf = sh.join(df, "shingle")
      .select(col(idCol), col("shingle"), col("df"))
    shWithDf.write.mode("overwrite").parquet(s"$path/shingles")
    df.write.mode("overwrite").parquet(s"$path/df")
    shWithDf.where(col("df") <= maxDf)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
      .write.mode("overwrite").parquet(s"$path/sizes")
    import spark.implicits._
    Seq((n, maxDf, docs.count()))
      .toDF("n", "max_df", "n_docs")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** All near-dup pairs (Jaccard >= threshold under the COMBINED-corpus
    * df cap) with at least one side in `newDocs`, computed against the
    * index at `path`. New-batch ids must be disjoint from indexed ids
    * (an append batch by definition). Output (id_a, id_b, jaccard),
    * canonical id_a < id_b — identical to the restricted full
    * recompute. */
  def nearDupPairs(spark: SparkSession, path: String, newDocs: DataFrame,
                   idCol: String, textCol: String,
                   threshold: Double = 0.5): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val n = meta.getAs[Int]("n")
    val maxDf = meta.getAs[Long]("max_df")

    val newSh = Dedup.shingles(newDocs, idCol, textCol, n)
    // df within the batch, plus the indexed df for exactly those
    // shingles (column-pruned scan of df/, broadcast-filtered) →
    // combined df. Bounded by |distinct new shingles|.
    val dfNew = newSh.groupBy("shingle").agg(count(lit(1)).as("df_new"))
    val dfOldForNew = spark.read.parquet(s"$path/df")
      .join(broadcast(dfNew.select("shingle")), Seq("shingle"), "left_semi")
    val combDf = dfNew.join(dfOldForNew, Seq("shingle"), "left")
      .select(col("shingle"), col("df_new"),
        (col("df_new") + coalesce(col("df"), lit(0L))).as("df_comb"))

    // The new batch's capped shingle stream + per-doc capped sizes.
    val newCapped = newSh.join(
      broadcast(combDf.where(col("df_comb") <= maxDf).select("shingle")),
      "shingle")
    val newSizes = newCapped.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"))

    // THE one pass over the index: only rows whose shingle occurs in
    // the batch matter, and rows already over the build cap can never
    // survive the combined cap — both filters are map-side via the
    // broadcast. Survivors are bounded by |new shingles| × maxDf.
    val idx = spark.read.parquet(s"$path/shingles")
      .where(col("df") <= maxDf)
      .join(broadcast(combDf.select("shingle", "df_comb")), "shingle")
    // Shingles the batch pushed OVER the cap: they were counted in the
    // stored per-doc sizes and must be subtracted from n_a.
    val adj = idx.where(col("df_comb") > maxDf)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_capped"))
    val idxLive = idx.where(col("df_comb") <= maxDf)
      .select(col(idCol).as("old_id"), col("shingle"))

    // new-vs-old intersections (inverted-index join, scales with
    // matches), then sizes: n_a = stored capped size − newly-capped
    // count. The sizes/ scan is pruned by a broadcast of the candidate
    // old ids (bounded by the match count).
    val interNO = idxLive
      .join(newCapped.select(col(idCol).as("new_id"), col("shingle")), "shingle")
      .groupBy("old_id", "new_id").agg(count(lit(1)).as("n_inter"))
    val oldSizes = spark.read.parquet(s"$path/sizes")
      .join(broadcast(interNO.select(col("old_id").as(idCol)).distinct()), idCol)
      .join(adj, Seq(idCol), "left")
      .select(col(idCol).as("old_id"),
        (col("n_sh") - coalesce(col("n_capped"), lit(0L))).as("n_a"))
    val jNO = interNO
      .join(oldSizes, "old_id")
      .join(newSizes.select(col(idCol).as("new_id"), col("n_sh").as("n_b")),
        "new_id")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(least(col("old_id"), col("new_id")).as("id_a"),
        greatest(col("old_id"), col("new_id")).as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))

    // new-vs-new pairs under the same combined cap (the batch can
    // contain internal dups too) — [[Dedup.jaccardPairs]]'s shape over
    // the already-capped batch stream.
    val a = newCapped.select(col(idCol).as("id_a"), col("shingle"))
    val b = newCapped.select(col(idCol).as("id_b"), col("shingle"))
    val jNN = a.join(b, "shingle")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
      .join(newSizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(newSizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

    jNO.unionByName(jNN)
  }
}
