package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SimHash incremental index's contract is EQUALITY, not recall:
  * pigeonhole blocking is lossless inside the Hamming ball and the
  * verify reads only the stored fingerprints, so the incremental pass
  * must exactly equal the brute-force Hamming pairs over old ∪ new
  * restricted to batch-touching pairs. */
class IncrementalSimHashSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("inc-simhash").toString

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def bruteRestricted(all: DataFrame, newIds: Set[Long]): Set[(Long, Long)] = {
    val fps = Dedup.simhash(all, "doc_id", "text")
    val a = fps.select(col("doc_id").as("id_a"), col("simhash").as("__sa"))
    val b = fps.select(col("doc_id").as("id_b"), col("simhash").as("__sb"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b") &&
        bit_count(col("__sa").bitwiseXOR(col("__sb"))) <= 3 &&
        (col("id_a").isin(newIds.toSeq: _*) || col("id_b").isin(newIds.toSeq: _*)))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("incremental == brute restricted on the sf0.001 shard split (both layouts)") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oldDocs = all.where(col("doc_id") % 10 =!= 0)
    val shard = all.where(col("doc_id") % 10 === 0)
    val newIds = shard.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = bruteRestricted(all, newIds)
    for (parts <- Seq(0, 16)) {
      val dir = tmp()
      IncrementalSimHash.writeIndex(oldDocs, "doc_id", "text", dir,
        maxHamming = 3, blockPartitions = parts)
      val got = pairsOf(IncrementalSimHash.nearDupPairs(spark, dir, shard,
        "doc_id", "text"))
      assert(got === expected, s"layout parts=$parts diverged")
    }
    assert(expected.nonEmpty, "corpus has no simhash near-dups — test is vacuous")
  }

  test("partitioned probe carries a partition filter; appends inherit and replay-exclude") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a b c d e f g h"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "a b c d e f g h")).toDF("doc_id", "text")
    val dir = tmp()
    IncrementalSimHash.writeIndex(base, "doc_id", "text", dir,
      maxHamming = 3, blockPartitions = 8)
    val probe = IncrementalSimHash.nearDupPairs(spark, dir, batch,
      "doc_id", "text")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bp"),
      s"partitioned probe lost its partition filter:\n$plan")
    assert(pairsOf(probe) === Set((1L, 10L)))
    // append under an epoch; a later batch sees it, a replay excludes it
    IncrementalSimHash.appendToIndex(batch, "doc_id", "text", dir, "b1")
    val batch2 = Seq((20L, "a b c d e f g h")).toDF("doc_id", "text")
    val later = pairsOf(IncrementalSimHash.nearDupPairs(spark, dir, batch2,
      "doc_id", "text"))
    assert(later === Set((1L, 20L), (10L, 20L)))
    val replayed = pairsOf(IncrementalSimHash.nearDupPairs(spark, dir, batch,
      "doc_id", "text", excludeEpochs = Seq("b1")))
    assert(replayed === Set((1L, 10L)), "replay must see the pre-batch index")
    // idempotent overwrite
    val rows1 = spark.read.parquet(s"$dir/blocks").count()
    IncrementalSimHash.appendToIndex(batch, "doc_id", "text", dir, "b1")
    assert(spark.read.parquet(s"$dir/blocks").count() === rows1)
  }
}
