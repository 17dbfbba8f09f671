package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Routes raw CDC JSON strings to their logical source table.
  *
  * The reference does this with a row-at-a-time Python UDF running
  * `re.findall` over the *unparsed* JSON string
  * (`/root/reference/glue/cdc_hudi.py:115-140`): a record belongs to
  * (db, table) when `"schema-name":"<db>"` and `"table-name":"<t>"` (DMS)
  * or `"db":"<db>"` and `"table":"<t>"` (Flink/Debezium) occur anywhere in
  * the document; DMS additionally rejects records containing
  * `"record-type":"control"`. Because the configured names are
  * interpolated into the pattern, they may themselves be regexes
  * (`/root/reference/README.md:38`).
  *
  * Here the router is a native `Column` predicate built from `rlike`,
  * which (a) erases the JVM→Python boundary, (b) stays inside whole-stage
  * codegen, and (c) is visible to Catalyst, so it can be pushed below
  * later operators. Two modes:
  *
  *  - [[substringMatch]] — byte-for-byte parity with the reference's
  *    quirky "match anywhere in the raw string" semantics (including the
  *    documented false positive when a *value* contains
  *    `"table":"user"`, SURVEY.md §7.4.3).
  *  - [[strictMatch]] — the tightened alternative: match against parsed
  *    envelope fields only (requires the frame already parsed).
  */
object CdcRouter {

  /** Parity router over the raw JSON string column.
    *
    * Exact semantics of `filter_table` (`glue/cdc_hudi.py:115-140`):
    * unanchored regex search; `db`/`table` interpolated verbatim (so they
    * may be regex fragments); DMS-only control-record rejection.
    */
  def substringMatch(value: Column, format: CdcFormat, table: SyncTable): Column =
    format match {
      case CdcFormat.DmsCdc =>
        value.rlike(s""""schema-name":"${table.dbName}"""") &&
          value.rlike(s""""table-name":"${table.tableName}"""") &&
          !value.rlike(""""record-type":"control"""")
      case _ =>
        value.rlike(s""""db":"${table.dbName}"""") &&
          value.rlike(s""""table":"${table.tableName}"""")
    }

  /** Strict router over parsed envelope columns (post-`from_json`).
    *
    * `db`/`table` are still treated as anchored regexes to preserve the
    * regex-in-config capability (`README.md:38`), but they must match the
    * actual envelope field, not arbitrary payload bytes.
    */
  def strictMatch(parsed: Column, format: CdcFormat, table: SyncTable): Column = {
    def full(c: Column, pat: String): Column = c.rlike(s"^(?:$pat)$$")
    format match {
      case CdcFormat.DmsCdc =>
        full(parsed.getField("metadata").getField("schema-name"), table.dbName) &&
          full(parsed.getField("metadata").getField("table-name"), table.tableName) &&
          parsed.getField("metadata").getField("record-type") === lit("data")
      case _ =>
        full(parsed.getField("source").getField("db"), table.dbName) &&
          full(parsed.getField("source").getField("table"), table.tableName)
    }
  }
}
