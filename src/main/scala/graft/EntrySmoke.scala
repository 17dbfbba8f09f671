package graft
import org.apache.spark.sql.SparkSession
/** Replica of the driver's t1 smoke: a PLAIN session (no graft-specific
  * config — notably no nanosAsLong) calling SparkEntry.entry; rows must
  * be > 0. Keeps `entry` honest about not depending on session config. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
