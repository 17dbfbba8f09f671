package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The signature-index twin's contract: candidates from the persisted
  * banded buckets, verified to EXACT uncapped Jaccard — so every
  * reported pair appears, with an identical jaccard value, in the
  * uncapped full recompute restricted to batch-touching pairs (the
  * subset property the recall gate rests on); epoch appends are
  * replay-idempotent; and the index stores a fixed number of rows per
  * document regardless of document length (the "∝ docs, not tokens"
  * claim). */
class IncrementalMinHashSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("inc-minhash").toString

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Double]("jaccard"))).toSet

  private val old = docs(
    (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "p q r s t u"))
  private val nw = docs(
    (10L, "a b c d e f"),            // dup of 1 (near-dup of 2)
    (11L, "p q r s t u"),            // dup of 3
    (12L, "x y z w v u"),            // novel
    (13L, "x y z w v q"))            // near-dup of 12 (new-new pair)

  test("found pairs are a subset of the uncapped restricted exact set, jaccard identical") {
    val dir = tmp()
    IncrementalMinHash.writeIndex(old, "doc_id", "text", dir, n = 3)
    val found = pairsOf(IncrementalMinHash.nearDupPairs(spark, dir, nw,
      old.unionByName(nw), "doc_id", "text", threshold = 0.2))
    val exact = pairsOf(
      Dedup.jaccardPairs(old.unionByName(nw), "doc_id", "text",
          n = 3, threshold = 0.2, maxDf = Long.MaxValue)
        .where(col("id_a") >= 10 || col("id_b") >= 10))
    assert(found.subsetOf(exact),
      s"spurious pairs: ${found -- exact}")
    assert(found.nonEmpty)
    // identical docs MUST collide in every band — exact dups can't be
    // missed, so both new-old legs and the new-new leg are present
    assert(found.exists { case (a, b, _) => a == 1L && b == 10L })
    assert(found.exists { case (a, b, _) => a == 3L && b == 11L })
    assert(found.exists { case (a, b, _) => a == 12L && b == 13L })
  }

  test("epoch append extends the index; replay excludes its own epoch and self-pairs") {
    val dir = tmp()
    IncrementalMinHash.writeIndex(old, "doc_id", "text", dir, n = 3)
    val before = pairsOf(IncrementalMinHash.nearDupPairs(spark, dir, nw,
      old.unionByName(nw), "doc_id", "text", threshold = 0.2))
    IncrementalMinHash.appendToIndex(nw, "doc_id", "text", dir, epoch = "b1")
    // the replayed flag pass (crash after append, before checkpoint):
    // excluding the batch's own epoch restores the pre-append read
    val replay = pairsOf(IncrementalMinHash.nearDupPairs(spark, dir, nw,
      old.unionByName(nw), "doc_id", "text", threshold = 0.2,
      excludeEpochs = Seq("b1")))
    assert(replay === before)
    // a LATER batch sees the appended docs: 20 duplicates 12 (epoch b1)
    val nw2 = docs((20L, "x y z w v u"))
    val later = pairsOf(IncrementalMinHash.nearDupPairs(spark, dir, nw2,
      old.unionByName(nw).unionByName(nw2), "doc_id", "text", threshold = 0.2))
    assert(later.exists { case (a, b, _) => a == 12L && b == 20L })
    // idempotent overwrite: re-appending the same epoch doesn't grow it
    val rows1 = spark.read.parquet(s"$dir/buckets").count()
    IncrementalMinHash.appendToIndex(nw, "doc_id", "text", dir, epoch = "b1")
    assert(spark.read.parquet(s"$dir/buckets").count() === rows1)
  }

  test("partitioned layout: identical output to flat; probe scan prunes by partition") {
    val s = spark; import s.implicits._
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oldDocs = all.where(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
    val shard = all.where(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    val flat = tmp(); val part = tmp()
    IncrementalMinHash.writeIndex(oldDocs, "doc_id", "text", flat, n = 3)
    IncrementalMinHash.writeIndex(oldDocs, "doc_id", "text", part, n = 3,
      bucketPartitions = 16)
    val viaFlat = pairsOf(IncrementalMinHash.nearDupPairs(spark, flat, shard,
      all, "doc_id", "text", threshold = 0.12))
    val viaPart = pairsOf(IncrementalMinHash.nearDupPairs(spark, part, shard,
      all, "doc_id", "text", threshold = 0.12))
    assert(viaPart === viaFlat)
    assert(viaPart.nonEmpty)
    // the layout really is partitioned, and a filtered read classifies
    // __bp as a partition filter (dir-level pruning at the source)
    val dirs = Option(new java.io.File(s"$part/buckets/__epoch=base").listFiles()).get
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__bp=")).toSet
    assert(dirs.nonEmpty && dirs.size <= 16)
    val prunedPlan = spark.read.parquet(s"$part/buckets")
      .where(org.apache.spark.sql.functions.col("__bp").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters") && prunedPlan.contains("__bp"))
    // appends inherit the layout and later probes see them
    IncrementalMinHash.appendToIndex(
      Seq((900001L, "j k l m n o p")).toDF("doc_id", "text"),
      "doc_id", "text", part, epoch = "b1")
    val b1Dirs = Option(new java.io.File(s"$part/buckets/__epoch=b1").listFiles()).get
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__bp=")).toSet
    assert(b1Dirs.nonEmpty)
    val later = pairsOf(IncrementalMinHash.nearDupPairs(spark, part,
      Seq((900002L, "j k l m n o p")).toDF("doc_id", "text"),
      Seq((900001L, "j k l m n o p"), (900002L, "j k l m n o p"))
        .toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.2))
    assert(later.exists { case (a, b, _) => a == 900001L && b == 900002L })
  }

  test("index stores a fixed row count per doc, independent of doc length") {
    val short = docs((1L, "a b c d e"))
    val long = docs((2L, Seq.tabulate(500)(i => s"w$i").mkString(" ")))
    val dS = tmp(); val dL = tmp()
    IncrementalMinHash.writeIndex(short, "doc_id", "text", dS, n = 3,
      bands = 16, rows = 4)
    IncrementalMinHash.writeIndex(long, "doc_id", "text", dL, n = 3,
      bands = 16, rows = 4)
    assert(spark.read.parquet(s"$dS/buckets").count() === 16L)
    assert(spark.read.parquet(s"$dL/buckets").count() === 16L)
    // the exact index's postings, by contrast, grow with tokens
    IncrementalDedup.writeIndex(long, "doc_id", "text", dL + "-exact", n = 3)
    assert(spark.read.parquet(s"$dL-exact/shingles").count() === 498L)
  }
}
