package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL entry point for the custom kernels via SparkSessionExtensions.
  * Needs its own session (extensions bind at build time). */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate returns any existing default session and silently drops
  // extensions — clear first so this builder really applies them, then
  // restore the shared suite session as default for later suites.
  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prior.foreach(SparkSession.setDefaultSession)
    s
  }

  test("graft_dot and graft_cosine are callable from SQL") {
    val row = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c""".stripMargin)
      .head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 0.0)
  }

  test("graft_winnow is callable from SQL and honors the length guard") {
    val row = spark.sql(
      """SELECT size(graft_winnow('the quick brown fox jumps', 8, 4)) AS n,
        |       size(graft_winnow('tiny', 8, 4)) AS z""".stripMargin)
      .head()
    assert(row.getInt(0) > 0)
    assert(row.getInt(1) === 0)
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_winnow('text', length('xx'), 4)").head()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("graft_repetition_stats is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_repetition_stats('a b a b a') AS s").head()
    assert(r.getSeq[Long](0) === Seq(5L, 3L, 5L, 4L, 2L))
  }

  test("graft_nfc is callable from SQL") {
    val got = spark.sql("SELECT graft_nfc('é') AS t").head().getString(0)
    assert(got === "é")
  }

  test("graft_bloom_might_contain is callable from SQL; path must be literal") {
    // build a tiny bloom through the public write path
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gx-bloom").toString
    graft.ext.Decontamination.writeBloomIndex(
      Seq((1L, "hello world of spark")).toDF("doc_id", "text"),
      "doc_id", "text", dir, n = 2)
    val p = s"$dir/bloom/filter.bin"
    val row = spark.sql(
      s"""SELECT graft_bloom_might_contain('hello world', '$p') AS hit,
         |       graft_bloom_might_contain(CAST(NULL AS STRING), '$p') AS nul
         |""".stripMargin).head()
    assert(row.getBoolean(0))
    assert(row.isNullAt(1))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bloom_might_contain('x', concat('a', 'b'))").head()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
