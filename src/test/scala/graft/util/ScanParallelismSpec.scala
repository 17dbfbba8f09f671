package graft.util

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** The widen decision seam (guide §2.5): derived from the file listing
  * and the parquet row-group layout, never from RDD materialization —
  * and correct in the case the old `df.rdd.getNumPartitions` probe got
  * wrong (a single-row-group file that byte-splits into many planned
  * but hollow partitions). */
class ScanParallelismSpec extends SparkSpecBase {

  private def writeOneRowGroup(dir: String, rows: Int): String = {
    val s = spark; import s.implicits._
    (1 to rows).map(i => (i.toLong, s"text $i")).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("t").toString

  test("single-row-group file narrower than the cores is widened " +
      "(repartition on the key, target = defaultParallelism)") {
    val dir = writeOneRowGroup(tmp("widen-small"), rows = 1000)
    val df = spark.read.parquet(dir)
    val out = ScanParallelism.widen(df, "id")
    val plan = out.queryExecution.logical.toString()
    assert(plan.contains("RepartitionByExpression"),
      s"expected a repartition in:\n$plan")
    // content unchanged, parallelism raised to the session default
    assert(out.count() === 1000)
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("hollow byte-splits do not fake parallelism: a single-row-group " +
      "file above maxPartitionBytes still widens (the old .rdd probe's " +
      "failure mode)") {
    val dir = writeOneRowGroup(tmp("widen-hollow"), rows = 5000)
    // shrink the split size so Spark would PLAN >= cores byte-range
    // partitions over this one-row-group file — only one of them can be
    // non-empty, so widen must still fire
    val key = "spark.sql.files.maxPartitionBytes"
    val before = spark.conf.get(key)
    spark.conf.set(key, "1024")
    try {
      val df = spark.read.parquet(dir)
      // the OLD probe would see >= cores planned partitions and skip
      assert(df.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
      val out = ScanParallelism.widen(df, "id")
      assert(out.queryExecution.logical.toString()
        .contains("RepartitionByExpression"))
      assert(out.count() === 5000)
    } finally spark.conf.set(key, before)
  }

  test("a listing with >= cores files is a no-op without reading any " +
      "footer, and the decision is cached across constructions") {
    val s = spark; import s.implicits._
    val dir = tmp("widen-manyfiles")
    val n = spark.sparkContext.defaultParallelism
    (1 to 10000).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .repartition(n + 2).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.inputFiles.length >= n)
    val before = ScanParallelism.footerReads.get()
    val out = ScanParallelism.widen(df, "id")
    assert(out eq df, "widen must be a no-op on an already-parallel scan")
    assert(ScanParallelism.footerReads.get() === before,
      "the many-files fast path must not open parquet footers")
    // second construction of the same reader: decision served from cache
    val out2 = ScanParallelism.widen(spark.read.parquet(dir), "id")
    assert(out2.queryExecution.logical.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])
    assert(ScanParallelism.footerReads.get() === before)
  }

  test("widen never triggers a Spark job at decision time " +
      "(query-construction cost stays driver-listing only)") {
    val dir = writeOneRowGroup(tmp("widen-nojob"), rows = 100)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    // the reader itself may run a schema-inference job; widen must not
    val df = spark.read.parquet(dir)
    spark.sparkContext.addSparkListener(listener)
    try {
      Thread.sleep(500) // drain any in-flight listener events
      jobs = 0
      ScanParallelism.widen(df, "id")
      Thread.sleep(500) // listener events are async
      assert(jobs === 0, "widen ran a Spark job while deciding")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
