package graft.stream

import graft.SparkSpecBase
import graft.ext.{Dedup, IncrementalMinHash}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming flag→append e2e on the signature index: shard 2's report
  * must see shard 1 (signatures AND corpus text both appended before
  * the next trigger), every reported pair must appear in the exact
  * uncapped restricted recompute (the subset contract), and a crashed
  * replay that excludes its own epoch reads the pre-batch state. */
class StreamMinHashSpec extends SparkSpecBase {

  test("each shard is flagged against all prior ingest, then joins index and corpus") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val base = Seq(
      (1L, "a b c d e f"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("smh-idx").toString
    val corpus = Files.createTempDirectory("smh-corpus").toString
    IncrementalMinHash.writeIndex(base, "doc_id", "text", idx, n = 3)
    StreamMinHash.seedCorpus(base, "doc_id", "text", corpus)

    val out = Files.createTempDirectory("smh-out").toString
    val ckpt = Files.createTempDirectory("smh-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamMinHash.start(input.toDF().toDF("doc_id", "text"),
      idx, corpus, out, ckpt, threshold = 0.2)
    val shard1 = Seq((10L, "a b c d e g"), (11L, "w x y z v t"))
    val shard2 = Seq((20L, "w x y z v q"), (21L, "p q r s t u"))
    try {
      input.addData(shard1: _*)
      q.processAllAvailable()
      input.addData(shard2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // subset of the per-shard exact uncapped restricted recomputes
    def restricted(all: Seq[(Long, String)], newIds: Set[Long]) =
      Dedup.jaccardPairs(all.toDF("doc_id", "text"), "doc_id", "text",
          n = 3, threshold = 0.2, maxDf = Long.MaxValue)
        .where(col("id_a").isin(newIds.toSeq: _*) ||
          col("id_b").isin(newIds.toSeq: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseSeq = Seq((1L, "a b c d e f"), (2L, "p q r s t u"))
    val exact =
      restricted(baseSeq ++ shard1, Set(10L, 11L)) ++
        restricted(baseSeq ++ shard1 ++ shard2, Set(20L, 21L))
    assert(got.subsetOf(exact), s"spurious pairs: ${got -- exact}")
    // identical docs collide in every band — 2 ~ 21 is an exact dup and
    // can't be missed; 11 ~ 20 proves shard 1's append (signatures AND
    // corpus text for verification) was visible to shard 2
    assert(got.contains((2L, 21L)))
    assert(got.contains((11L, 20L)))
  }

  test("replayed batch excludes its own epoch from index and corpus reads") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "a b c d e f"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e g"), (11L, "p q r s t v")).toDF("doc_id", "text")

    def mk(appendBatch: Boolean): (String, String) = {
      val idx = Files.createTempDirectory("smh-r-idx").toString
      val corpus = Files.createTempDirectory("smh-r-corpus").toString
      IncrementalMinHash.writeIndex(base, "doc_id", "text", idx, n = 3)
      StreamMinHash.seedCorpus(base, "doc_id", "text", corpus)
      if (appendBatch) { // the crashed state: appends landed, no commit
        IncrementalMinHash.appendToIndex(batch, "doc_id", "text", idx, "b7")
        batch.write.mode("overwrite").parquet(s"$corpus/__epoch=b7")
      }
      (idx, corpus)
    }
    def pairs(idx: String, corpusDir: String, excl: Seq[String]) = {
      val corpusAll = spark.read.parquet(corpusDir)
      val corpus = (if (excl.isEmpty) corpusAll
                    else corpusAll.where(!col("__epoch").isin(excl: _*)))
        .select("doc_id", "text")
      IncrementalMinHash.nearDupPairs(spark, idx, batch, corpus,
          "doc_id", "text", threshold = 0.2, excludeEpochs = excl)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("jaccard"))).toSet
    }

    val (cleanIdx, cleanCorpus) = mk(appendBatch = false)
    val (crashIdx, crashCorpus) = mk(appendBatch = true)
    val expected = pairs(cleanIdx, cleanCorpus, Nil)
    val replayed = pairs(crashIdx, crashCorpus, Seq("b7"))
    assert(replayed === expected)
    assert(expected.nonEmpty)
    assert(!replayed.exists { case (a, b, _) => a == b })
  }
}
