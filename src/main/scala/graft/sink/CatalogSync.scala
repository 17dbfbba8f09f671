package graft.sink

import org.apache.spark.sql.SparkSession

/** The catalog seam of the upsert sinks — the engine's equivalent of the
  * reference's unconditional Hive/Glue sync after every Hudi commit
  * (`/root/reference/glue/cdc_hudi.py:190-194`). Both sinks publish
  * by-name access through THIS interface only, so pointing a deployment
  * at an external metastore (Glue, HMS, Unity) is one binding swap at
  * construction time — no sink logic changes, and the commit protocol
  * (publish AFTER the pointer swap, never before) stays in the sinks.
  *
  * Two publish shapes exist because the two layouts need different
  * catalog objects: the COW table is a single directory → an external
  * location-based table; the bucketed table's snapshot is a manifest
  * over many commit dirs → a view with a static partition-pruned body
  * (see [[BucketedUpsertTable.syncCatalog]]).
  */
trait CatalogSync {

  /** Publish `nameParts` (`Seq(db, table)` or `Seq(table)`) as an
    * external parquet table rooted at `location`, creating the database
    * if needed. Must be metadata-only (never touch data files) and must
    * propagate schema changes between successive locations. */
  def publishExternalTable(nameParts: Seq[String], location: java.net.URI): Unit

  /** Publish `nameParts` as a (replaceable) view whose body is
    * `selectBody`, creating the database if needed. Metadata-only. */
  def publishView(nameParts: Seq[String], selectBody: String): Unit
}

/** The in-session binding: publishes into the Spark session catalog with
  * plain SQL DDL — behaviorally identical to the pre-seam inline
  * statements (this class is a pure extraction). An external-metastore
  * binding implements the same two methods against its API instead. */
final class SessionCatalogSync(spark: SparkSession) extends CatalogSync {

  private def quoted(parts: Seq[String]): String =
    parts.map(p => s"`$p`").mkString(".")

  private def ensureDatabase(parts: Seq[String]): Unit =
    if (parts.length == 2)
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `${parts.head}`")

  override def publishExternalTable(parts: Seq[String],
                                    location: java.net.URI): Unit = {
    ensureDatabase(parts)
    val fqn = parts.mkString(".")
    val q = quoted(parts)
    // Steady state: ALTER ... SET LOCATION — metadata-only with NO
    // visibility gap for concurrent by-name readers. DROP+CREATE only
    // when the schema changed (the catalog entry pins the schema from
    // creation time) or the table doesn't exist yet; that brief gap is
    // confined to evolution commits.
    val sameSchema = spark.catalog.tableExists(fqn) &&
      scala.util.Try(spark.table(fqn).schema ==
        spark.read.parquet(location.toString).schema).getOrElse(false)
    if (sameSchema)
      spark.sql(s"ALTER TABLE $q SET LOCATION '$location'")
    else {
      spark.sql(s"DROP TABLE IF EXISTS $q")
      spark.sql(s"CREATE TABLE $q USING parquet LOCATION '$location'")
    }
  }

  override def publishView(parts: Seq[String], selectBody: String): Unit = {
    ensureDatabase(parts)
    spark.sql(s"CREATE OR REPLACE VIEW ${quoted(parts)} AS $selectBody")
  }
}
