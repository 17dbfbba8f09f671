package graft.sink

import graft.SparkSpecBase
import graft.cdc.CdcNormalize

import java.nio.file.Files

/** The CatalogSync seam: both sinks must publish by-name access through
  * the injected binding only (the cluster's metastore swap point), and
  * the default session binding must behave exactly as the pre-seam
  * inline DDL did — the by-name behavior itself is covered by the
  * existing catalog tests in the two sink specs, which run through
  * [[SessionCatalogSync]] after the extraction. */
class CatalogSyncSpec extends SparkSpecBase {

  private val M = CdcNormalize.MtimeCol
  private val D = CdcNormalize.DeletedCol

  /** Records every publish; performs none. */
  private final class Recording extends CatalogSync {
    var tables = Vector.empty[(Seq[String], java.net.URI)]
    var views = Vector.empty[(Seq[String], String)]
    override def publishExternalTable(parts: Seq[String],
                                      location: java.net.URI): Unit =
      tables :+= ((parts, location))
    override def publishView(parts: Seq[String], body: String): Unit =
      views :+= ((parts, body))
  }

  test("the COW sink publishes each commit's snapshot through the binding") {
    val s = spark; import s.implicits._
    val root = Files.createTempDirectory("graft-cat-cow")
    val rec = new Recording
    val t = new KeyedUpsertTable(spark, root.toString, Seq("id"),
      catalogTable = Some("gdb.cow_seam"), catalogSync = Some(rec))
    t.upsert(Seq((1L, "a", 100L, false)).toDF("id", "v", M, D))
    t.upsert(Seq((1L, "a2", 200L, false)).toDF("id", "v", M, D))
    assert(rec.tables.map(_._1) === Vector(Seq("gdb", "cow_seam"), Seq("gdb", "cow_seam")))
    // compare URI PATHS: Hadoop renders file:/p where java.nio renders
    // file:///p — the location is what the binding must receive
    assert(rec.tables.map(_._2.getPath) ===
      Vector(root.resolve("snap-0").toString,
        root.resolve("snap-1").toString))
    assert(rec.views.isEmpty)
    // nothing leaked into the session catalog — the binding owns publishing
    assert(!spark.catalog.databaseExists("gdb"))
  }

  test("the bucketed sink publishes each commit's view body through the binding") {
    val s = spark; import s.implicits._
    val root = Files.createTempDirectory("graft-cat-bkt")
    val rec = new Recording
    val t = new BucketedUpsertTable(spark, root.toString, Seq("id"),
      nBuckets = 4, catalogTable = Some("bkt_seam"), catalogSync = Some(rec))
    t.upsert(Seq((1L, "a", 100L, false)).toDF("id", "v", M, D))
    assert(rec.views.map(_._1) === Vector(Seq("bkt_seam")))
    val body = rec.views.head._2
    assert(body.contains("data/commit-0") && body.contains("`__bucket` IN ("),
      s"view body must be the pruned commit-dir form, got: $body")
    assert(rec.tables.isEmpty)
    assert(!spark.catalog.tableExists("bkt_seam"))
  }
}
