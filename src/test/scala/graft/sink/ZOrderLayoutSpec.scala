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

  test("boundary drift: rederiveBoundaries restores pruning; default reuse does not") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-z6").toString
    ZOrderLayout.write(table(), Seq("x", "y"), dir, targetFiles = 16)
    // drifted ingest: the key distribution migrates entirely ABOVE the
    // stored boundaries — every drifted row maps to the top bucket of
    // both columns, so under the stored bucketing they are z-UNSORTABLE
    val drifted = (0 until 4096).map { i =>
      val x = 1000L + (i * 37) % 64
      val y = 1000.0 + ((i * 101) % 64) * 1.5
      (100000L + i, x, y, s"d$i")
    }.toDF("id", "x", "y", "tag")
    ZOrderLayout.append(drifted, dir, epoch = "b1", batchFiles = 4)
    // a small rectangle INSIDE the drifted region
    val ranges: ZOrderLayout.Ranges =
      Map("x" -> (Some(1010.0), Some(1020.0)), "y" -> (Some(1015.0), Some(1045.0)))
    val expect = drifted
      .where(col("x").between(1010, 1020) && col("y").between(1015.0, 1045.0))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(expect.nonEmpty && expect.size < 1000)
    def prunedIds() = ZOrderLayout.readPruned(spark, dir, ranges)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    def rowsScanned(): Long = {
      val (kept, _) = ZOrderLayout.candidateFiles(spark, dir, ranges)
      if (kept.isEmpty) 0L else spark.read.parquet(kept: _*).count()
    }
    // default optimize (boundary REUSE): correct but loose — the whole
    // drifted half shares one z-value, so its rows cannot spread across
    // files and the rectangle read drags in ~all 4096 drifted rows
    ZOrderLayout.optimize(spark, dir, targetFiles = 16)
    assert(prunedIds() === expect)
    val loose = rowsScanned()
    assert(loose >= 4096,
      s"expected stored-boundary pruning to be loose under drift, scanned $loose")
    // the scheduled repair: re-derive boundaries over the folded table —
    // the drifted region gets real quantiles and pruning tightens
    ZOrderLayout.optimize(spark, dir, targetFiles = 16,
      rederiveBoundaries = true)
    assert(prunedIds() === expect)
    val tight = rowsScanned()
    assert(tight * 2 <= loose,
      s"rederive should at least halve the scanned rows: $loose -> $tight")
  }

  test("crash matrix: a crash before ANY swap rename rolls forward on next read") {
    val s = spark; import s.implicits._
    val ranges: ZOrderLayout.Ranges =
      Map("x" -> (Some(10.0), Some(20.0)), "y" -> (Some(15.0), Some(45.0)))
    val expect = table()
      .where(col("x").between(10, 20) && col("y").between(15.0, 45.0))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // 6 renames: 3 aside (meta, manifest, data) + 3 staged-in. k = 0
    // crashes before the first — the old table must keep serving; k in
    // 1..5 crash mid-swap — recovery must finish the swap.
    for (k <- 0 to 5) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-zc$k").toString
      ZOrderLayout.write(table().where(col("id") < 3000), Seq("x", "y"),
        dir, targetFiles = 8)
      ZOrderLayout.append(table().where(col("id") >= 3000), dir,
        epoch = "b1", batchFiles = 2)
      intercept[IllegalStateException] {
        ZOrderLayout.optimizeImpl(spark, dir, targetFiles = 8,
          preserveEpochs = Nil, rederiveBoundaries = false,
          crashAtRename = k)
      }
      // every reader entry point must serve the complete table
      assert(ZOrderLayout.read(spark, dir).count() === 4096,
        s"read() after crash at rename $k")
      assert(ZOrderLayout.readPruned(spark, dir, ranges)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq === expect,
        s"readPruned() after crash at rename $k")
      // and a subsequent optimize completes cleanly, clearing the debris
      ZOrderLayout.optimize(spark, dir, targetFiles = 8)
      assert(!new java.io.File(s"$dir/__compact").exists())
      assert(!new java.io.File(s"$dir/__old").exists())
      assert(ZOrderLayout.read(spark, dir).count() === 4096)
    }
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
