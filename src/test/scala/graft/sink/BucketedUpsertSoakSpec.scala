package graft.sink

import graft.SparkSpecBase
import graft.cdc.CdcNormalize

import org.apache.spark.sql.DataFrame

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Long-soak of the bucketed incremental sink: 100 commits including
  * periodic schema-evolution migrations. What must stay BOUNDED —
  * O(retained commits) / O(buckets), never O(history):
  * snapshot dirs on disk, data commit dirs on disk, manifest entries,
  * the read plan, and the synced view body. What must stay CORRECT
  * after the full soak: latest-wins state, including deletes and rows
  * that predate each migration. */
class BucketedUpsertSoakSpec extends SparkSpecBase {

  private val M = CdcNormalize.MtimeCol
  private val D = CdcNormalize.DeletedCol

  private val NBuckets = 8
  private val Retain = 2
  private val NCommits = 100
  private val Keyspace = 60L

  /** Evolution points: commit 30 adds `w`, commit 70 adds `x`. */
  private def schemaOf(commit: Int): Int =
    if (commit >= 70) 2 else if (commit >= 30) 1 else 0

  private def mkBatch(commit: Int, rows: Seq[(Long, String, Long, Boolean)]): DataFrame = {
    val s = spark; import s.implicits._
    schemaOf(commit) match {
      case 0 => rows.toDF("id", "v", M, D)
      case 1 => rows.map { case (id, v, ts, d) => (id, v, ts, d, id * 10) }
        .toDF("id", "v", M, D, "w")
      case _ => rows.map { case (id, v, ts, d) => (id, v, ts, d, id * 10, s"x$id") }
        .toDF("id", "v", M, D, "w", "x")
    }
  }

  private final class RecordingSync extends CatalogSync {
    var lastBody: String = ""
    override def publishExternalTable(parts: Seq[String],
                                      location: java.net.URI): Unit = ()
    override def publishView(parts: Seq[String], body: String): Unit =
      lastBody = body
  }

  test("100-commit soak with migrations: disk, manifest, plan, and view stay bounded; state stays exact") {
    val root = Files.createTempDirectory("graft-bkt-soak")
    val sync = new RecordingSync
    val t = new BucketedUpsertTable(spark, root.toString, Seq("id"),
      nBuckets = NBuckets, retainSnapshots = Retain,
      catalogTable = Some("soak_db.t"), catalogSync = Some(sync))

    // test-side oracle: latest-wins by strictly increasing ts
    val expected = scala.collection.mutable.Map.empty[Long, String]

    for (c <- 0 until NCommits) {
      // 4 upserts + (every 7th commit) 1 delete, deterministic keys
      val ts = (c + 1) * 100L
      val ups = (0 until 4).map { i =>
        val id = math.floorMod(c * 13L + i * 17L, Keyspace)
        (id, s"v$c-$i", ts + i, false)
      }
      val dels =
        if (c % 7 == 6) Seq((math.floorMod(c * 5L, Keyspace), "del", ts + 50, true))
        else Seq.empty
      t.upsert(mkBatch(c, ups ++ dels))
      ups.foreach { case (id, v, _, _) => expected(id) = v }
      dels.foreach { case (id, _, _, _) => expected.remove(id) }

      if (c % 10 == 9) {
        val entries = Option(root.toFile.listFiles()).getOrElse(Array.empty)
        val snaps = entries.count(_.getName.startsWith("snap-"))
        assert(snaps <= Retain, s"commit $c: $snaps snapshot dirs retained (> $Retain)")
        val dataDirs = Option(root.resolve("data").toFile.listFiles())
          .getOrElse(Array.empty).count(_.isDirectory)
        // each retained manifest references at most NBuckets commit dirs
        assert(dataDirs <= NBuckets + Retain,
          s"commit $c: $dataDirs data dirs on disk — history is leaking")
      }
    }

    // -------- disk bounds after the soak
    val snaps = Option(root.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("snap-")).map(_.getName).sorted
    assert(snaps.length === Retain)
    assert(snaps.last === s"snap-${NCommits - 1}")

    // -------- manifest bounded by buckets, not history
    val manifest = (0 until NBuckets).flatMap(t.bucketDir)
    assert(manifest.nonEmpty && manifest.length <= NBuckets)

    // -------- read plan: ONE multi-path scan, size independent of history
    val df = t.read().get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) === 1,
      "read() must stay a single multi-path scan")
    assert(plan.linesIterator.size < 40,
      s"read plan grew to ${plan.linesIterator.size} lines — O(history) leak")

    // -------- synced view body: one branch per referenced COMMIT DIR
    val branches = sync.lastBody.split("UNION ALL").length
    assert(branches <= NBuckets,
      s"view body has $branches branches — should be bounded by commit dirs, not history")

    // -------- exact state after 100 commits incl. 2 migrations + deletes
    val got = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(got === expected.toMap)
    // migration columns present with the union schema; pre-migration
    // survivors carry nulls in the added columns, post-migration rows
    // carry values
    assert(df.columns.contains("w") && df.columns.contains("x"))
    val byId = df.collect().map(r => r.getAs[Long]("id") -> r).toMap
    byId.foreach { case (id, r) =>
      if (!r.isNullAt(r.fieldIndex("w")))
        assert(r.getAs[Long]("w") === id * 10)
    }
  }
}
