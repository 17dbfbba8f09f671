package graft.cdc

/** The three CDC envelope dialects the engine understands.
  *
  * Reconstructed from the reference's routing/parse logic
  * (`/root/reference/glue/cdc_hudi.py:115-177`): AWS DMS wraps the row
  * image in `data` + `metadata`, while Flink-CDC and MSK-Debezium both
  * use the Debezium `before`/`after`/`op`/`ts_ms` envelope and are
  * treated identically everywhere (`glue/cdc_hudi.py:126,156,168`).
  */
sealed trait CdcFormat { def name: String }

object CdcFormat {
  /** AWS DMS envelope: `{"data":{...},"metadata":{"timestamp":...,
    * "record-type":"data"|"control","operation":"load|insert|update|delete",
    * "schema-name":...,"table-name":...}}` (`glue/cdc_hudi.py:120-125,151`). */
  case object DmsCdc extends CdcFormat { val name = "DMS-CDC" }

  /** Debezium-style envelope produced by Flink CDC connectors
    * (`glue/cdc_hudi.py:126-133,156-159`). */
  case object FlinkCdc extends CdcFormat { val name = "FLINK-CDC" }

  /** Debezium-style envelope from MSK Connect / Kafka Connect
    * (`glue/cdc_hudi.py:126-133,156-159`). */
  case object MskDebeziumCdc extends CdcFormat { val name = "MSK-DEBEZIUM-CDC" }

  val all: Seq[CdcFormat] = Seq(DmsCdc, FlinkCdc, MskDebeziumCdc)

  def fromName(s: String): CdcFormat = all.find(_.name.equalsIgnoreCase(s.trim))
    .getOrElse(throw new IllegalArgumentException(
      s"unknown cdc_format '$s' (expected one of ${all.map(_.name).mkString(", ")})"))

  /** True for the two Debezium-shaped dialects. */
  def isDebeziumLike(f: CdcFormat): Boolean = f != DmsCdc
}

/** One logical source table to materialize: (db, table, primary key).
  *
  * Mirrors the reference's `sync_table_list` config entries
  * (`/root/reference/config/job.properties:16-19`). `primaryKey` may be a
  * comma-separated composite key (`glue/cdc_hudi.py:148,157`), and
  * `dbName`/`tableName` may themselves be regular expressions
  * (`/root/reference/README.md:38`).
  */
final case class SyncTable(dbName: String, tableName: String, primaryKey: String) {
  def pkCols: Seq[String] = primaryKey.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
  /** Identifier used for sink paths / scheduler pools / schema-cache keys. */
  def id: String = s"$dbName.$tableName"
}
