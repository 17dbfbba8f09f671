package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental-vs-full equivalence contract: pairs from the
  * persisted-index incremental pass must equal the full recompute over
  * old ∪ new restricted to pairs touching the new batch — INCLUDING
  * when the batch pushes a shingle's combined document frequency over
  * the cap (the arithmetic the index's stored df/sizes exist for). */
class IncrementalDedupSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("inc-dedup").toString

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Double]("jaccard"))).toSet

  private def restrictedFull(all: DataFrame, newIds: Set[Long], n: Int,
                             threshold: Double, maxDf: Long): Set[(Long, Long, Double)] =
    pairsOf(Dedup.jaccardPairs(all, "doc_id", "text", n, threshold, maxDf)
      .where(col("id_a").isin(newIds.toSeq: _*) ||
        col("id_b").isin(newIds.toSeq: _*)))

  test("incremental == restricted full recompute (no cap pressure)") {
    val old = docs(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "p q r s t u"))
    val nw = docs(
      (10L, "a b c d e f"),            // dup of 1 (and near-dup of 2)
      (11L, "p q r s t u"),            // dup of 3
      (12L, "x y z w v u"),            // novel
      (13L, "x y z w v q"))            // near-dup of 12 (new-new pair)
    val dir = tmp()
    IncrementalDedup.writeIndex(old, "doc_id", "text", dir, n = 3, maxDf = 50L)
    val inc = pairsOf(IncrementalDedup.nearDupPairs(spark, dir, nw,
      "doc_id", "text", threshold = 0.2))
    val full = restrictedFull(old.unionByName(nw), Set(10L, 11L, 12L, 13L),
      n = 3, threshold = 0.2, maxDf = 50L)
    assert(inc === full)
    assert(inc.nonEmpty)
    // sanity: both new-old and new-new pairs present
    assert(inc.exists { case (a, b, _) => a < 10 && b >= 10 })
    assert(inc.exists { case (a, b, _) => a >= 10 && b >= 10 })
  }

  test("incremental == restricted full when the batch crosses the df cap") {
    // shingle "x y z" has df 3 in the old corpus (== cap); the batch
    // adds two more occurrences → combined df 5 > 3 → it must drop from
    // BOTH sides' capped sets, shrinking old docs' effective sizes.
    val old = docs(
      (1L, "x y z a b c"), (2L, "x y z d e f"), (3L, "x y z a b d"))
    val nw = docs(
      (10L, "x y z a b c"),            // shares "x y z" AND "a b c" w/ 1
      (11L, "x y z q r s"))            // shares ONLY the capped shingle
    val dir = tmp()
    IncrementalDedup.writeIndex(old, "doc_id", "text", dir, n = 3, maxDf = 3L)
    val inc = pairsOf(IncrementalDedup.nearDupPairs(spark, dir, nw,
      "doc_id", "text", threshold = 0.1))
    val full = restrictedFull(old.unionByName(nw), Set(10L, 11L),
      n = 3, threshold = 0.1, maxDf = 3L)
    assert(inc === full)
    // doc 11's only shared shingle was capped → it pairs with no one
    assert(!inc.exists { case (a, b, _) => a == 11L || b == 11L })
    // doc 10 still pairs with 1 via the surviving "a b c"/"y z a"/"z a b"
    assert(inc.exists { case (a, b, _) => a == 1L && b == 10L })
  }

  test("incremental == restricted full on the sf0.001 corpus split") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val old = all.where(col("doc_id") % 10 =!= 0)
    val nw = all.where(col("doc_id") % 10 === 0)
    val dir = tmp()
    IncrementalDedup.writeIndex(old, "doc_id", "text", dir, n = 3, maxDf = 50L)
    val inc = pairsOf(IncrementalDedup.nearDupPairs(spark, dir, nw,
      "doc_id", "text", threshold = 0.12))
    val full = pairsOf(
      Dedup.jaccardPairs(all, "doc_id", "text", 3, 0.12, 50L)
        .where(col("id_a") % 10 === 0 || col("id_b") % 10 === 0))
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("appendToIndex: flagging after two appends == restricted full recompute") {
    val old = docs(
      (1L, "a b c d e f"), (2L, "p q r s t u"), (3L, "m n o j k l"))
    val b1 = docs(
      (10L, "a b c d e g"),              // near-dup of 1
      (11L, "w x y z v t"))              // novel
    val b2 = docs(
      (20L, "a b c d e f"),              // dup of 1, near-dup of 10 (appended!)
      (21L, "w x y z v q"),              // near-dup of 11 (appended!)
      (22L, "m n o j k l"))              // dup of 3 (from the base build)
    val dir = tmp()
    IncrementalDedup.writeIndex(old, "doc_id", "text", dir, n = 3, maxDf = 50L)
    IncrementalDedup.appendToIndex(b1, "doc_id", "text", dir, epoch = "b1")
    val inc = pairsOf(IncrementalDedup.nearDupPairs(spark, dir, b2,
      "doc_id", "text", threshold = 0.2))
    val full = restrictedFull(old.unionByName(b1).unionByName(b2),
      Set(20L, 21L, 22L), n = 3, threshold = 0.2, maxDf = 50L)
    assert(inc === full)
    // pairs against BOTH the base build and the appended epoch exist
    assert(inc.exists { case (a, _, _) => a == 1L })   // base epoch
    assert(inc.exists { case (a, _, _) => a == 10L || a == 11L }) // appended
  }

  test("appendToIndex: a cap crossed only by the SUM of epochs is honored") {
    // "x y z" df: 2 in base + 1 in append + 1 in batch = 4 > maxDf 3 —
    // no single epoch crosses the cap, only the current total does; the
    // derived-against-totals sizes make the restricted recompute exact.
    val old = docs((1L, "x y z a b c"), (2L, "x y z d e f"))
    val b1 = docs((10L, "x y z g h i"))
    val b2 = docs((20L, "x y z a b c"))
    val dir = tmp()
    IncrementalDedup.writeIndex(old, "doc_id", "text", dir, n = 3, maxDf = 3L)
    IncrementalDedup.appendToIndex(b1, "doc_id", "text", dir, epoch = "b1")
    val inc = pairsOf(IncrementalDedup.nearDupPairs(spark, dir, b2,
      "doc_id", "text", threshold = 0.1))
    val full = restrictedFull(old.unionByName(b1).unionByName(b2),
      Set(20L), n = 3, threshold = 0.1, maxDf = 3L)
    assert(inc === full)
    // "x y z" capped ⇒ 20 pairs only with 1 (via "a b c"/"y z a"/"z a b"
    // minus the capped ones), never with 10 (sole shared gram capped)
    assert(!inc.exists { case (a, b, _) => a == 10L || b == 10L })
    assert(inc.exists { case (a, b, _) => a == 1L && b == 20L })
  }

  test("appendToIndex is replay-idempotent: a re-run epoch never double-counts df") {
    // All three docs identical; every shingle's true combined df is
    // exactly 3 == maxDf (live). A double-counted replay of b1 would
    // push df to 4 > cap, capping EVERY shingle and erasing all pairs —
    // so a non-empty, exact result proves the overwrite semantics.
    val old = docs((1L, "a b c d e f"))
    val b1 = docs((10L, "a b c d e f"))
    val b2 = docs((20L, "a b c d e f"))
    val dir = tmp()
    IncrementalDedup.writeIndex(old, "doc_id", "text", dir, n = 3, maxDf = 3L)
    IncrementalDedup.appendToIndex(b1, "doc_id", "text", dir, epoch = "b1")
    IncrementalDedup.appendToIndex(b1, "doc_id", "text", dir, epoch = "b1") // replay
    val inc = pairsOf(IncrementalDedup.nearDupPairs(spark, dir, b2,
      "doc_id", "text", threshold = 0.2))
    val full = restrictedFull(old.unionByName(b1).unionByName(b2),
      Set(20L), n = 3, threshold = 0.2, maxDf = 3L)
    assert(inc === full)
    assert(inc === Set((1L, 20L, 1.0), (10L, 20L, 1.0)))
  }

  test("bucketed layout: output identical to flat; pass-A scan prunes to batch-gram dirs") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val old = all.where(col("doc_id") % 10 =!= 0)
    // a tiny batch (few grams) so its bucket set covers only SOME of
    // the 16 shingle buckets — the pruning regime
    val nw = docs((900001L, "a b c d e f g"))
    val flat = tmp(); val bkt = tmp()
    IncrementalDedup.writeIndex(old, "doc_id", "text", flat, n = 3, maxDf = 50L)
    IncrementalDedup.writeIndex(old, "doc_id", "text", bkt, n = 3, maxDf = 50L,
      shingleBuckets = 16)
    // identical results through either layout (here: identical empties
    // or pairs — use the real sf shard too for a non-trivial check)
    val shard = all.where(col("doc_id") % 10 === 0)
    val viaFlat = pairsOf(IncrementalDedup.nearDupPairs(spark, flat, shard,
      "doc_id", "text", threshold = 0.12))
    val viaBkt = pairsOf(IncrementalDedup.nearDupPairs(spark, bkt, shard,
      "doc_id", "text", threshold = 0.12))
    assert(viaBkt === viaFlat)
    assert(viaBkt.nonEmpty)
    // the layout really is bucketed: epoch dir holds __sb= partitions
    val epochDir = new java.io.File(s"$bkt/shingles/__epoch=base")
    val sbDirs = Option(epochDir.listFiles()).get
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__sb=")).toSet
    assert(sbDirs.nonEmpty && sbDirs.size <= 16)
    // and a small batch's pass-A read PRUNES: the bucket-set filter is
    // classified as a PARTITION filter on the scan (so the source skips
    // non-matching dirs at listing time — `inputFiles` can't show this:
    // it reports the relation's unpruned listing), and the scanned rows
    // carry only the batch's buckets
    val batchBuckets = Dedup.shingles(nw, "doc_id", "text", 3)
      .select(pmod(hash(col("shingle")), lit(16)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(batchBuckets.size < sbDirs.size, "batch covers all buckets — widen the corpus")
    val pruned = spark.read.parquet(s"$bkt/shingles")
      .where(col("__sb").isin(batchBuckets.toSeq: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__sb"),
      s"bucket filter not pushed as a partition filter:\n$plan")
    val scannedBuckets = pruned.select("__sb").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(scannedBuckets.subsetOf(batchBuckets))
    // appends inherit the bucketed layout (mixed depths would break
    // partition discovery) and stay correct
    IncrementalDedup.appendToIndex(nw, "doc_id", "text", bkt, epoch = "b1")
    val b1Dirs = Option(new java.io.File(s"$bkt/shingles/__epoch=b1").listFiles()).get
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__sb=")).toSet
    assert(b1Dirs.nonEmpty && b1Dirs.subsetOf(
      batchBuckets.map(b => s"__sb=$b")))
    val nw2 = docs((900002L, "a b c d e f g"))   // dup of the appended doc
    val after = pairsOf(IncrementalDedup.nearDupPairs(spark, bkt, nw2,
      "doc_id", "text", threshold = 0.2))
    assert(after.exists { case (a, b, _) => a == 900001L && b == 900002L })
  }

  test("decontam flagAgainstIndex == direct decontaminate on the shard") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = all.where(col("doc_id") % 17 === 0)
    val shard = all.where(col("doc_id") % 17 =!= 0 && col("doc_id") % 10 === 0)
    val dir = tmp()
    Decontamination.writeIndex(bench, "doc_id", "text", dir, n = 8)
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toSet
    val viaIndex = rows(
      Decontamination.flagAgainstIndex(spark, dir, shard, "doc_id", "text"))
    val direct = rows(
      Decontamination.decontaminate(shard, bench, "doc_id", "text", n = 8))
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty)
  }
}
