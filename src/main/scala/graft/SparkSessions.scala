package graft

import org.apache.spark.sql.SparkSession

/** The one local-session builder shared by Verify/Bench/BenchOne and the
  * test base — previously copy-pasted per main, which let required flags
  * (nanosAsLong, micros timestamps) silently drift between the verified
  * path and the benches. */
object SparkSessions {
  private lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toUri.toString

  def localBuilder(cores: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); Spark 4 reads it only as
      // bigint nanos (converted losslessly in CdcQueries.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // dumps carry the same micros timestamp type the DuckDB oracle
      // produces (INT96 would read back as tz-annotated nanos).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // catalog-sync (K1) creates databases; keep the warehouse out of
      // the repo working tree. One dir per JVM (getOrCreate ignores the
      // config after the first session anyway).
      .config("spark.sql.warehouse.dir", warehouseDir)

  def local(cores: String): SparkSession = {
    val s = localBuilder(cores, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
