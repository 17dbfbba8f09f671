package graft.ext

import graft.util.StagedSwap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance for the [[NgramLm]] quality model. N-gram
  * counts are a MONOID — per-epoch partials sum to exactly the counts a
  * full retrain would produce — so the persisted model is just three
  * per-epoch count tables, each append is O(batch), and scoring any
  * shard under the summed model is identical to scoring it under a
  * from-scratch model of the full corpus (the `llm_lm_incremental`
  * oracle proves this equivalence live).
  *
  * This is the production shape for a quality filter that must track a
  * growing corpus: CCNet retrains its LM offline; a count-based model
  * folds the day's shard in with one aggregate and no reread.
  *
  * Layout at `path`:
  *  - `tri/__epoch=<e>/` (gram, c3) — trigram count partials;
  *  - `big/__epoch=<e>/` (gram, c2) — context-bigram count partials;
  *  - `chars/__epoch=<e>/` (gram) — the epoch's distinct characters
  *    (charset size V = distinct across epochs; NOT summable, so the
  *    union is taken at read time — the table is charset-bounded).
  *
  * Every table is charset-bounded (|charset|³ worst case), so reads are
  * tiny regardless of corpus size, and the summed model broadcasts in
  * [[NgramLm.score]] exactly like a freshly-trained one. */
object IncrementalNgramLm {

  def writeIndex(docs: DataFrame, textCol: String, path: String): Unit = {
    writeEpoch(docs, textCol, path, "base")
    val spark = docs.sparkSession
    import spark.implicits._
    // `meta` doubles as the compaction swap's sentinel (aside first /
    // in last — see StagedSwap)
    Seq(3).toDF("n").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/meta")
  }

  /** O(batch) append, IDEMPOTENT per epoch (a replay overwrites its own
    * partition dirs — the [[IncrementalDedup.appendToIndex]] argument). */
  def appendToIndex(newDocs: DataFrame, textCol: String, path: String,
                    epoch: String): Unit = {
    require(epoch.nonEmpty && epoch != "base" && !epoch.contains('/'),
      s"epoch must be a non-'base', path-safe name, got '$epoch'")
    // roll a crashed compaction forward BEFORE writing: an epoch dir
    // created inside a half-swapped table would be set aside (and lost)
    // by a later recovery
    swapFor(newDocs.sparkSession, path).recover()
    writeEpoch(newDocs, textCol, path, epoch)
  }

  private def writeEpoch(docs: DataFrame, textCol: String, path: String,
                         epoch: String): Unit = {
    val m = NgramLm.train(docs, textCol)
    m.tri.write.mode("overwrite").parquet(s"$path/tri/__epoch=$epoch")
    m.big.write.mode("overwrite").parquet(s"$path/big/__epoch=$epoch")
    m.charset.write.mode("overwrite").parquet(s"$path/chars/__epoch=$epoch")
  }

  private def swapFor(spark: SparkSession, path: String) =
    new StagedSwap(spark, path, sentinel = "meta",
      others = Seq("tri", "big", "chars"))

  /** Fold every epoch's count partials into a single `base` epoch (the
    * [[IncrementalSpanDedup.compact]] maintenance pass — counts sum,
    * the charset unions; staged + crash-safe ordered rename; results
    * identical before and after, spec-asserted; quiet window only,
    * checkpoint-committed epochs only). */
  def compact(spark: SparkSession, path: String): Unit = {
    val swap = swapFor(spark, path)
    swap.recover()
    spark.read.parquet(s"$path/tri").groupBy("gram")
      .agg(sum("c3").as("c3"))
      .write.mode("overwrite")
      .parquet(s"${swap.stagedDir("tri")}/__epoch=base")
    spark.read.parquet(s"$path/big").groupBy("gram")
      .agg(sum("c2").as("c2"))
      .write.mode("overwrite")
      .parquet(s"${swap.stagedDir("big")}/__epoch=base")
    spark.read.parquet(s"$path/chars").select("gram").distinct()
      .write.mode("overwrite")
      .parquet(s"${swap.stagedDir("chars")}/__epoch=base")
    spark.read.parquet(s"$path/meta").coalesce(1)
      .write.mode("overwrite").parquet(swap.stagedDir("meta"))
    swap.swap()
  }

  /** The summed model over every epoch not excluded — exactly the model
    * a full retrain over the union corpus would produce. */
  def model(spark: SparkSession, path: String,
            excludeEpochs: Seq[String] = Nil): NgramLm.Model = {
    swapFor(spark, path).recover()
    def rd(t: String): DataFrame = {
      val d = spark.read.parquet(s"$path/$t")
      if (excludeEpochs.isEmpty) d
      else d.where(!col("__epoch").isin(excludeEpochs: _*))
    }
    NgramLm.Model(
      tri = rd("tri").groupBy("gram").agg(sum("c3").as("c3")),
      big = rd("big").groupBy("gram").agg(sum("c2").as("c2")),
      charset = rd("chars").select("gram").distinct())
  }

  /** Score a shard under the current summed model. */
  def score(spark: SparkSession, path: String, docs: DataFrame,
            idCol: String, textCol: String,
            excludeEpochs: Seq[String] = Nil): DataFrame =
    NgramLm.score(docs, idCol, textCol, model(spark, path, excludeEpochs))
}
