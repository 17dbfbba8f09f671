package graft.ext

import graft.util.StagedSwap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance for the [[NaiveBayes]] quality classifier.
  * Per-(token, class) counts are a MONOID — per-epoch partials sum to
  * exactly the counts a full retrain would produce — and totals and
  * vocabulary size DERIVE from the summed count table, so the persisted
  * model is ONE per-epoch count table, each append is O(batch), and
  * scoring any shard under the summed model is identical to scoring it
  * under a from-scratch model of the full corpus (the
  * `llm_nb_incremental` oracle proves this equivalence live).
  *
  * This is the production shape for a classifier filter that must track
  * a growing corpus: FineWeb/DCLM retrain their fastText offline; a
  * count-based model folds the day's shard in with one aggregate and no
  * reread of history.
  *
  * Layout at `path`:
  *  - `tok/__epoch=<e>/` (tok, c_pos, c_neg) — count partials;
  *  - `meta/` — the compaction swap's sentinel (same discipline as
  *    [[IncrementalNgramLm]]).
  *
  * The table is vocab-bounded, so reads are tiny regardless of corpus
  * size and the summed model broadcasts in [[NaiveBayes.score]] exactly
  * like a freshly-trained one. */
object IncrementalNaiveBayes {

  def writeIndex(docs: DataFrame, textCol: String, labelCol: String,
                 path: String): Unit = {
    writeEpoch(docs, textCol, labelCol, path, "base")
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(1).toDF("n").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/meta")
  }

  /** O(batch) append, IDEMPOTENT per epoch (a replay overwrites its own
    * partition dir). */
  def appendToIndex(newDocs: DataFrame, textCol: String, labelCol: String,
                    path: String, epoch: String): Unit = {
    require(epoch.nonEmpty && epoch != "base" && !epoch.contains('/'),
      s"epoch must be a non-'base', path-safe name, got '$epoch'")
    swapFor(newDocs.sparkSession, path).recover()
    writeEpoch(newDocs, textCol, labelCol, path, epoch)
  }

  private def writeEpoch(docs: DataFrame, textCol: String, labelCol: String,
                         path: String, epoch: String): Unit =
    NaiveBayes.train(docs, textCol, labelCol).tok
      .write.mode("overwrite").parquet(s"$path/tok/__epoch=$epoch")

  private def swapFor(spark: SparkSession, path: String) =
    new StagedSwap(spark, path, sentinel = "meta", others = Seq("tok"))

  /** Fold every epoch's count partials into a single `base` epoch
    * (staged + crash-safe ordered rename; results identical before and
    * after; quiet window only, checkpoint-committed epochs only). */
  def compact(spark: SparkSession, path: String): Unit = {
    val swap = swapFor(spark, path)
    swap.recover()
    spark.read.parquet(s"$path/tok").groupBy("tok")
      .agg(sum("c_pos").as("c_pos"), sum("c_neg").as("c_neg"))
      .write.mode("overwrite")
      .parquet(s"${swap.stagedDir("tok")}/__epoch=base")
    spark.read.parquet(s"$path/meta").coalesce(1)
      .write.mode("overwrite").parquet(swap.stagedDir("meta"))
    swap.swap()
  }

  /** The summed model over every epoch not excluded — exactly the model
    * a full retrain over the union corpus would produce. */
  def model(spark: SparkSession, path: String,
            excludeEpochs: Seq[String] = Nil): NaiveBayes.Model = {
    swapFor(spark, path).recover()
    val d = spark.read.parquet(s"$path/tok")
    val kept =
      if (excludeEpochs.isEmpty) d
      else d.where(!col("__epoch").isin(excludeEpochs: _*))
    NaiveBayes.Model(kept.groupBy("tok")
      .agg(sum("c_pos").as("c_pos"), sum("c_neg").as("c_neg")))
  }

  /** Score a shard under the current summed model. */
  def score(spark: SparkSession, path: String, docs: DataFrame,
            idCol: String, textCol: String,
            excludeEpochs: Seq[String] = Nil): DataFrame =
    NaiveBayes.score(docs, idCol, textCol, model(spark, path, excludeEpochs))
}
