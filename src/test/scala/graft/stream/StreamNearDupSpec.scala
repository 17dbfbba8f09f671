package graft.stream

import graft.SparkSpecBase
import graft.ext.{Dedup, IncrementalDedup}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming flag→append e2e: shard 2's report must see shard 1 (the
  * append landed before the next trigger), and each shard's report must
  * equal the full-recompute restriction over everything ingested up to
  * and including that shard. */
class StreamNearDupSpec extends SparkSpecBase {

  test("each shard is flagged against all prior ingest, then joins the index") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    val base = Seq(
      (1L, "a b c d e f"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val idx = Files.createTempDirectory("snd-idx").toString
    IncrementalDedup.writeIndex(base, "doc_id", "text", idx, n = 3, maxDf = 50L)

    val out = Files.createTempDirectory("snd-out").toString
    val ckpt = Files.createTempDirectory("snd-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamNearDup.start(input.toDF().toDF("doc_id", "text"),
      idx, out, ckpt, threshold = 0.2)
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
    // expected: union of per-shard restricted recomputes over the
    // corpus state AT that shard's trigger
    def restricted(all: Seq[(Long, String)], newIds: Set[Long]) =
      Dedup.jaccardPairs(all.toDF("doc_id", "text"), "doc_id", "text",
          n = 3, threshold = 0.2, maxDf = 50L)
        .where(col("id_a").isin(newIds.toSeq: _*) ||
          col("id_b").isin(newIds.toSeq: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseSeq = Seq((1L, "a b c d e f"), (2L, "p q r s t u"))
    val expected =
      restricted(baseSeq ++ shard1, Set(10L, 11L)) ++
        restricted(baseSeq ++ shard1 ++ shard2, Set(20L, 21L))
    assert(got === expected)
    // the cross-shard pair proves shard 1's append was visible to
    // shard 2's flag pass (11 ~ 20), and base pairs resolve too (2 ~ 21)
    assert(got.contains((11L, 20L)))
    assert(got.contains((2L, 21L)))
  }

  test("replayed batch excludes its own epoch: report equals the pre-append read") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "a b c d e f"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e g"), (11L, "p q r s t v")).toDF("doc_id", "text")

    // Clean index: base only. Crashed-replay index: base + the batch's
    // own epoch already appended (crash landed after appendToIndex but
    // before the checkpoint commit).
    val clean = Files.createTempDirectory("snd-clean").toString
    IncrementalDedup.writeIndex(base, "doc_id", "text", clean, n = 3, maxDf = 50L)
    val crashed = Files.createTempDirectory("snd-crash").toString
    IncrementalDedup.writeIndex(base, "doc_id", "text", crashed, n = 3, maxDf = 50L)
    IncrementalDedup.appendToIndex(batch, "doc_id", "text", crashed, epoch = "b7")

    def pairs(path: String, excl: Seq[String]) =
      IncrementalDedup.nearDupPairs(spark, path, batch, "doc_id", "text",
          threshold = 0.2, excludeEpochs = excl)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("jaccard"))).toSet

    val expected = pairs(clean, Nil)
    val replayed = pairs(crashed, Seq("b7"))
    assert(replayed === expected)
    assert(expected.nonEmpty)
    // and no self-pair survives even WITHOUT the epoch exclusion —
    // the old_id =!= new_id guard is the defense in depth
    val unguarded = pairs(crashed, Nil)
    assert(unguarded.forall { case (a, b, _) => a != b })
  }
}
