package graft.sink

import graft.SparkSpecBase
import graft.cdc.CdcNormalize
import graft.util.{GraftRawTestFileSystem, GraftTestAbstractFs, GraftTestFileSystem, TableFs}

import org.apache.spark.sql.DataFrame

import java.nio.file.Files

/** The sinks against a NON-DEFAULT FileSystem scheme: every manifest,
  * pointer, cleaner, and data path must resolve through the Hadoop
  * FileSystem registered for the table root's scheme — the cluster
  * contract, where the root is `hdfs://` or an object store, not the
  * driver's local disk. `graftfs://` is local storage behind a custom
  * scheme (see [[graft.util.GraftTestFileSystem]]), so assertions can
  * still inspect the layout, while any residual `java.nio` call in the
  * sinks would bypass the scheme and fail these tests (metadata written
  * where data isn't, or scheme-qualified paths fed to `java.nio`). */
class SinkSchemeSpec extends SparkSpecBase {

  private val M = CdcNormalize.MtimeCol
  private val D = CdcNormalize.DeletedCol

  private def registerSchemes(): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    hc.set("fs.AbstractFileSystem.graftfs.impl", classOf[GraftTestAbstractFs].getName)
    hc.set("fs.graftraw.impl", classOf[GraftRawTestFileSystem].getName)
  }

  private def schemeRoot(prefix: String): String =
    "graftfs:" + Files.createTempDirectory(prefix).toString

  private def batch(rows: (Long, String, Long, Boolean)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "v", M, D)
  }

  private def state(read: Option[DataFrame]): Map[Long, String] =
    read.get.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap

  private def driveAndCheck(mk: String => UpsertSink,
                            read: UpsertSink => Option[DataFrame],
                            root: String): Unit = {
    val t = mk(root)
    t.upsert(batch((1L, "a1", 10L, false), (2L, "b1", 10L, false),
      (3L, "c1", 10L, false)))
    t.upsert(batch((2L, "b2", 20L, false), (3L, "gone", 20L, true),
      (4L, "d1", 20L, false)))
    t.upsert(batch((1L, "a3", 30L, false), (5L, "e1", 30L, false)))
    assert(state(read(t)) ===
      Map(1L -> "a3", 2L -> "b2", 4L -> "d1", 5L -> "e1"),
      s"merged state wrong through $root")
    // retention must have run through the scheme too: listing via the
    // registered FileSystem (never java.io) shows exactly the retained
    // snapshot manifests
    val tfs = new TableFs(root, spark.sparkContext.hadoopConfiguration)
    val snaps = tfs.listSubdirNames("").filter(_.matches("snap-\\d+")).sorted
    assert(snaps === Seq("snap-1", "snap-2"),
      s"cleaner through $root kept $snaps, expected the newest 2")
  }

  test("COW sink end-to-end on the graftfs:// scheme") {
    registerSchemes()
    driveAndCheck(r => new KeyedUpsertTable(spark, r, Seq("id")),
      _.asInstanceOf[KeyedUpsertTable].read(), schemeRoot("graftfs-cow"))
  }

  test("bucketed sink end-to-end on the graftfs:// scheme") {
    registerSchemes()
    driveAndCheck(r => new BucketedUpsertTable(spark, r, Seq("id"), nBuckets = 4),
      _.asInstanceOf[BucketedUpsertTable].read(), schemeRoot("graftfs-bkt"))
  }

  test("MOR sink end-to-end on the graftfs:// scheme, compaction included") {
    registerSchemes()
    val root = schemeRoot("graftfs-mor")
    val t = new MorUpsertTable(spark, root, Seq("id"), nBuckets = 2,
      compactAfter = 2)
    for (c <- 0 until 5) // same key every commit → chains force compaction
      t.upsert(batch((1L, s"v$c", c.toLong, false)))
    assert(state(t.read()) === Map(1L -> "v4"))
    assert((0 until 2).map(t.bucketChainLength).max <= 2,
      "inline compaction must bound chains through the scheme")
  }

  test("pointer swap works without an AbstractFileSystem binding " +
      "(versioned files; readers never see a missing pointer mid-swap)") {
    registerSchemes()
    val root = "graftraw:" + Files.createTempDirectory("graftraw-ptr").toString
    val tfs = new TableFs(root, spark.sparkContext.hadoopConfiguration)
    tfs.swapPointer("_current", "snap-0")
    assert(tfs.readPointer("_current") === Some("snap-0"))

    // a SECOND TableFs plays the concurrent reader: the mutation hook
    // resolves the pointer at every intermediate filesystem state the
    // swap passes through (around each rename/delete) — on a scheme
    // with NO AbstractFileSystem binding, readers must never see "no
    // snapshot" and never a torn value
    val reader = new TableFs(root, spark.sparkContext.hadoopConfiguration)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String])]
    graft.util.GraftRawTestFileSystem.onMutation =
      what => seen += (what -> reader.readPointer("_current"))
    try {
      tfs.swapPointer("_current", "snap-1")
      tfs.swapPointer("_current", "snap-2")
    } finally graft.util.GraftRawTestFileSystem.onMutation = _ => ()
    assert(seen.nonEmpty, "the swap must mutate through the scheme's FS")
    val bad = seen.filter { case (_, v) =>
      !v.exists(Set("snap-0", "snap-1", "snap-2")) }
    assert(bad.isEmpty, s"reader saw a missing/torn pointer at: $bad")
    assert(tfs.readPointer("_current") === Some("snap-2"))
    // retention: current + previous version survive, older ones and the
    // tmp files do not
    val vs = new java.io.File(root.stripPrefix("graftraw:")).listFiles()
      .map(_.getName).filter(_.startsWith("_current")).sorted.toSeq
    assert(vs === Seq("_current.v1", "_current.v2"), s"got $vs")
  }

  test("readPointer falls back to a legacy plain pointer file") {
    registerSchemes()
    val root = "graftraw:" + Files.createTempDirectory("graftraw-legacy").toString
    val tfs = new TableFs(root, spark.sparkContext.hadoopConfiguration)
    tfs.writeString("_current", "snap-7") // pre-versioning layout
    assert(tfs.readPointer("_current") === Some("snap-7"))
    tfs.swapPointer("_current", "snap-8") // upgrade replaces the legacy file
    assert(tfs.readPointer("_current") === Some("snap-8"))
    assert(!tfs.exists("_current"), "legacy plain file is cleaned on swap")
  }
}
