package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalLineDedupSpec extends SparkSpecBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val real = "/root/testdata/sf0.001/documents.parquet"

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def restrictedFull(all: DataFrame): Seq[String] =
    LineDedup.dropBoilerplate(all, "doc_id", "text",
        LineDedup.chunkLines(all, "doc_id", "text", 10), minDocs = 2)
      .where(col("doc_id") % 10 === 0)
      .orderBy("doc_id").collect().map(_.toString).toSeq

  test("incremental == full recompute restricted to the shard (real corpus)") {
    val all = spark.read.parquet(real)
    val dir = tmp("inc-line")
    IncrementalLineDedup.writeIndex(
      all.where(col("doc_id") % 10 =!= 0), "doc_id", "text", dir,
      lineW = 10, lineBuckets = 16)
    val inc = IncrementalLineDedup.dropBoilerplate(spark, dir,
        all.where(col("doc_id") % 10 === 0), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(inc === restrictedFull(all))
    assert(inc.exists(_.contains(",0]") == false), "shard rows exist")
  }

  test("a line hot ONLY because the shard adds its second document is dropped") {
    val corpus = df(1L -> "shared line\ncorpus only", 2L -> "unrelated words")
    val batch = df(10L -> "shared line\nbatch fresh")
    val dir = tmp("inc-line2")
    IncrementalLineDedup.writeIndex(corpus, "doc_id", "text", dir, lineW = 0)
    val out = IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
      "doc_id", "text", sep = "\n").collect()(0)
    assert(out.getString(1) === "batch fresh")
    assert((out.getLong(2), out.getLong(3)) === (1L, 1L))
  }

  test("within-batch cross-doc repetition flags without any corpus occurrence") {
    val corpus = df(1L -> "nothing shared")
    val batch = df(10L -> "banner\nunique a", 11L -> "banner\nunique b")
    val dir = tmp("inc-line3")
    IncrementalLineDedup.writeIndex(corpus, "doc_id", "text", dir, lineW = 0)
    val out = IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
        "doc_id", "text", sep = "\n")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq === Seq((10L, "unique a", 1L), (11L, "unique b", 1L)))
  }

  test("within-doc repetition alone stays df=1 across the index boundary") {
    // the same doc repeating its own line — in the corpus OR the batch —
    // is not boilerplate evidence (df counts DISTINCT docs per epoch,
    // and the single-ingest contract keeps the sum honest)
    val corpus = df(1L -> "echo\necho\ncorpus words")
    val batch = df(10L -> "echo\nbatch words")
    val dir = tmp("inc-line4")
    IncrementalLineDedup.writeIndex(corpus, "doc_id", "text", dir, lineW = 0)
    val out = IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
      "doc_id", "text", sep = "\n").collect()(0)
    // "echo" IS in 2 distinct docs now (doc 1 + doc 10) -> dropped;
    // but doc 1's double occurrence contributed df=1, not 2 — prove it
    // by a batch line the corpus repeats within one doc only
    assert(out.getString(1) === "batch words")
    val batch2 = df(20L -> "solo line\nmore words")
    val corpus2 = df(2L -> "solo line\nsolo line") // df=1 despite 2 occs
    val dir2 = tmp("inc-line4b")
    IncrementalLineDedup.writeIndex(corpus2, "doc_id", "text", dir2, lineW = 0)
    val out2 = IncrementalLineDedup.dropBoilerplate(spark, dir2, batch2,
      "doc_id", "text", sep = "\n").collect()(0)
    assert(out2.getLong(3) === 1L, "df 1(corpus)+1(batch) = 2 -> dropped")
  }

  test("append is replay-idempotent and excludeEpochs restores the pre-batch read") {
    val corpus = df(1L -> "base words only")
    val batch = df(10L -> "repeated line\nfresh tail")
    val dir = tmp("inc-line5")
    IncrementalLineDedup.writeIndex(corpus, "doc_id", "text", dir, lineW = 0)
    assert(IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
      "doc_id", "text").agg(sum("n_dropped")).collect()(0).getLong(0) === 0L)
    IncrementalLineDedup.appendToIndex(batch, "doc_id", "text", dir, "b1")
    IncrementalLineDedup.appendToIndex(batch, "doc_id", "text", dir, "b1")
    // excluding the replayed epoch: still nothing dropped
    assert(IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
        "doc_id", "text", excludeEpochs = Seq("b1"))
      .agg(sum("n_dropped")).collect()(0).getLong(0) === 0L)
    // with it in: batch doc + indexed copy = 2 distinct docs -> both
    // batch lines drop (the indexed epoch re-presents doc 10's lines)
    assert(IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
        "doc_id", "text")
      .agg(sum("n_dropped")).collect()(0).getLong(0) === 2L)
  }

  test("compact folds epochs to one with identical results") {
    val all = spark.read.parquet(real)
    val dir = tmp("inc-line-c")
    IncrementalLineDedup.writeIndex(
      all.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 =!= 0),
      "doc_id", "text", dir, lineW = 10, lineBuckets = 4)
    IncrementalLineDedup.appendToIndex(
      all.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 0),
      "doc_id", "text", dir, "b1")
    val batch = all.where(col("doc_id") % 10 === 0)
    val before = IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
        "doc_id", "text").orderBy("doc_id")
      .collect().map(_.toString).toSeq
    IncrementalLineDedup.compact(spark, dir)
    val after = IncrementalLineDedup.dropBoilerplate(spark, dir, batch,
        "doc_id", "text").orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(after === before)
    assert(before === restrictedFull(all),
      "two epochs must sum to the full-corpus df")
    val epochs = new java.io.File(s"$dir/counts").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__epoch="))
    assert(epochs.toSeq === Seq("__epoch=base"), s"got ${epochs.toSeq}")
  }
}
