package graft.sink

import graft.SparkSpecBase
import graft.functions.{ZOrderExpressions, ZValue}

import org.apache.spark.sql.functions._

/** Z-order clustered layout: round-trip fidelity, pruned-read
  * equivalence, genuine file skipping, and the z-value kernel's
  * interpreted/codegen parity. */
class ZOrderLayoutSpec extends SparkSpecBase {

  private def table() = {
    val s = spark; import s.implicits._
    // 4096 rows over a 64x64 grid plus value noise — enough rows that 16
    // files get distinct z-ranges, with (x, y) deliberately uncorrelated.
    (0 until 4096).map { i =>
      val x = (i * 37) % 64
      val y = (i * 101) % 64
      (i.toLong, x.toLong, y * 1.5, s"r$i")
    }.toDF("id", "x", "y", "tag")
  }

  test("full read returns exactly the written rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z1").toString
    val df = table()
    ZOrderLayout.write(df, Seq("x", "y"), dir, targetFiles = 16)
    val back = ZOrderLayout.read(spark, dir)
    assert(back.count() === 4096)
    assert(back.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq === (0L until 4096L))
  }

  test("pruned read ≡ full-scan filter, and files are genuinely skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z2").toString
    val df = table()
    ZOrderLayout.write(df, Seq("x", "y"), dir, targetFiles = 16)
    val ranges: ZOrderLayout.Ranges =
      Map("x" -> (Some(10.0), Some(20.0)), "y" -> (Some(15.0), Some(45.0)))
    val pruned = ZOrderLayout.readPruned(spark, dir, ranges)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val full = df.where(col("x").between(10, 20) && col("y").between(15.0, 45.0))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned === full)
    assert(full.nonEmpty, "test rectangle unexpectedly empty")
    val (kept, total) = ZOrderLayout.candidateFiles(spark, dir, ranges)
    assert(total === 16)
    assert(kept.size < total,
      s"expected the 2-D rectangle to skip files: kept ${kept.size} of $total")
  }

  test("single-dimension predicate also prunes (the multi-column point)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z3").toString
    ZOrderLayout.write(table(), Seq("x", "y"), dir, targetFiles = 16)
    // narrow band on x alone — a layout sorted only by y could not skip
    val (keptX, total) = ZOrderLayout.candidateFiles(spark, dir,
      Map("x" -> (Some(0.0), Some(3.0))))
    assert(keptX.size < total, s"x-band kept ${keptX.size} of $total")
    // narrow band on y alone — a layout sorted only by x could not skip
    val (keptY, _) = ZOrderLayout.candidateFiles(spark, dir,
      Map("y" -> (Some(0.0), Some(6.0))))
    assert(keptY.size < total, s"y-band kept ${keptY.size} of $total")
  }

  test("empty rectangle yields an empty frame with the table schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z4").toString
    ZOrderLayout.write(table(), Seq("x", "y"), dir, targetFiles = 8)
    val out = ZOrderLayout.readPruned(spark, dir,
      Map("x" -> (Some(1e9), None)))
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("id", "x", "y", "tag"))
  }

  test("append + optimize: the lakehouse maintenance loop") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-z5").toString
    val base = table().where(col("id") < 3000)
    val batch = table().where(col("id") >= 3000)
    ZOrderLayout.write(base, Seq("x", "y"), dir, targetFiles = 8)
    ZOrderLayout.append(batch, dir, epoch = "b1", batchFiles = 2)
    val ranges: ZOrderLayout.Ranges =
      Map("x" -> (Some(10.0), Some(20.0)), "y" -> (Some(15.0), Some(45.0)))
    // pruned read ≡ full filter over base ∪ batch
    def prunedIds() = ZOrderLayout.readPruned(spark, dir, ranges)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val expect = table()
      .where(col("x").between(10, 20) && col("y").between(15.0, 45.0))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(prunedIds() === expect)
    // manifest covers the appended files: total count grew by batchFiles
    val (_, totalAfterAppend) = ZOrderLayout.candidateFiles(spark, dir, ranges)
    assert(totalAfterAppend === 10)
    // at-least-once replay: re-appending the same epoch is a no-op
    ZOrderLayout.append(batch, dir, epoch = "b1", batchFiles = 2)
    assert(prunedIds() === expect)
    assert(ZOrderLayout.read(spark, dir).count() === 4096)
    val (_, totalAfterReplay) = ZOrderLayout.candidateFiles(spark, dir, ranges)
    assert(totalAfterReplay === 10)
    // optimize re-clusters to the target; answers unchanged, manifest
    // rebuilt, staging dir gone
    ZOrderLayout.optimize(spark, dir, targetFiles = 8)
    assert(prunedIds() === expect)
    val (keptOpt, totalOpt) = ZOrderLayout.candidateFiles(spark, dir, ranges)
    assert(totalOpt === 8)
    assert(keptOpt.size < totalOpt)
    assert(!new java.io.File(s"$dir/__compact").exists())
    assert(ZOrderLayout.read(spark, dir).count() === 4096)
  }

  test("z-value kernel: interpreted eval matches codegen; nulls rank first") {
    val s = spark; import s.implicits._
    val bnd = Seq(Array.tabulate(255)(i => i + 1.0),
      Array.tabulate(255)(i => (i + 1) * 2.0))
    val df = Seq((1.0, 2.0), (100.0, 200.0), (Double.NaN, 0.0))
      .toDF("a", "b")
    val viaDf = df.select(ZOrderExpressions.zValue(
      Seq(col("a"), col("b")), bnd).as("z")).collect().map(_.getLong(0))
    // interpreted path: evaluate the expression directly on literals
    import org.apache.spark.sql.catalyst.expressions.Literal
    def interp(a: Any, b: Any): Long =
      ZValue(Seq(Literal(a), Literal(b)), bnd).eval(null).asInstanceOf[Long]
    assert(viaDf.toSeq === Seq(interp(1.0, 2.0), interp(100.0, 200.0),
      interp(Double.NaN, 0.0)))
    // null → bucket 0: z of (null, 2.0) has all a-bits clear
    val zNull = ZValue(Seq(Literal.create(null,
      org.apache.spark.sql.types.DoubleType), Literal(2.0)), bnd)
      .eval(null).asInstanceOf[Long]
    assert((zNull & 0x5555555555555555L) === 0L) // even bits = col 0
    // NaN ranks last: bucket 255 for col 0
    val zNaN = interp(Double.NaN, 0.0)
    assert((0 until 8).forall(b => ((zNaN >> (2 * b)) & 1L) === 1L))
  }

  test("equal keys map to one bucket even when boundaries repeat") {
    // heavy skew: 255 identical boundaries (all 5.0) — values 5.0 must
    // land in ONE deterministic bucket, values below in bucket 0, above
    // in bucket 255
    val bnd = Array.fill(255)(5.0)
    assert(ZValue.bucketOf(bnd, 4.9) === 0)
    assert(ZValue.bucketOf(bnd, 5.0) === 255)
    assert(ZValue.bucketOf(bnd, 5.1) === 255)
  }
}
