package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

import java.nio.file.Files

class IncrementalDomainCapSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "domain")
  }

  private def admitted(out: org.apache.spark.sql.DataFrame): Set[Long] =
    out.where(col("admitted") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("shard admission equals the first-come cap over indexed ∪ shard") {
    val idx = Files.createTempDirectory("dc-idx").toString
    // a.com holds 2 of 3 budget slots, b.org holds 1, c.net is new
    val base = df((1L, "a.com"), (2L, "a.com"), (3L, "b.org"))
    IncrementalDomainCap.writeIndex(base, "doc_id", "domain", idx,
      cap = 3, buckets = 8)
    val shard = df((10L, "a.com"), (11L, "a.com"), (12L, "b.org"),
      (13L, "c.net"), (14L, "c.net"), (15L, "c.net"), (16L, "c.net"))
    val out = IncrementalDomainCap.admit(spark, idx, shard, "doc_id", "domain")
    // a.com: 1 slot left -> 10 in, 11 out; b.org: 2 left -> 12 in;
    // c.net: fresh -> 13,14,15 in, 16 out
    assert(admitted(out) === Set(10L, 12L, 13L, 14L, 15L))
    assert(out.count() === 7L) // one row per shard doc, rejected included
  }

  test("the next epoch sees the previous epoch's budget consumption") {
    val idx = Files.createTempDirectory("dc-idx2").toString
    IncrementalDomainCap.writeIndex(df((1L, "a.com")), "doc_id", "domain",
      idx, cap = 2, buckets = 0)
    val shard1 = df((10L, "a.com"))
    IncrementalDomainCap.appendToIndex(shard1, "doc_id", "domain", idx, "e1")
    // a.com is now full: base 1 + e1 1 = cap 2
    val out = IncrementalDomainCap.admit(spark, idx,
      df((20L, "a.com"), (21L, "fresh.org")), "doc_id", "domain")
    assert(admitted(out) === Set(21L))
  }

  test("appendToIndex is idempotent per epoch (replay overwrites itself)") {
    val idx = Files.createTempDirectory("dc-idx3").toString
    IncrementalDomainCap.writeIndex(df((1L, "a.com")), "doc_id", "domain",
      idx, cap = 3, buckets = 8)
    val shard = df((10L, "a.com"), (11L, "a.com"), (12L, "a.com"))
    IncrementalDomainCap.appendToIndex(shard, "doc_id", "domain", idx, "e1")
    val once = spark.read.parquet(s"$idx/counts")
      .groupBy("domain").agg(sum("n_kept").as("k")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // replay the SAME epoch: admit must exclude it and state must not move
    IncrementalDomainCap.appendToIndex(shard, "doc_id", "domain", idx, "e1")
    val twice = spark.read.parquet(s"$idx/counts")
      .groupBy("domain").agg(sum("n_kept").as("k")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(once === twice)
    assert(once("a.com") === 3L) // base 1 + e1 admitted 2 = cap
    val replayAdmit = IncrementalDomainCap.admit(spark, idx, shard,
      "doc_id", "domain", excludeEpochs = Seq("e1"))
    assert(admitted(replayAdmit) === Set(10L, 11L)) // byte-identical decision
  }

  test("compact folds epochs without changing any future decision") {
    val idx = Files.createTempDirectory("dc-idx4").toString
    IncrementalDomainCap.writeIndex(df((1L, "a.com"), (2L, "b.org")),
      "doc_id", "domain", idx, cap = 3, buckets = 8)
    IncrementalDomainCap.appendToIndex(df((10L, "a.com")), "doc_id",
      "domain", idx, "e1")
    val probe = df((20L, "a.com"), (21L, "b.org"), (22L, "c.net"))
    val before = admitted(
      IncrementalDomainCap.admit(spark, idx, probe, "doc_id", "domain"))
    IncrementalDomainCap.compact(spark, idx)
    val epochs = spark.read.parquet(s"$idx/counts").select("__epoch")
      .distinct().collect().map(_.getString(0)).toSeq
    assert(epochs === Seq("base"))
    val after = admitted(
      IncrementalDomainCap.admit(spark, idx, probe, "doc_id", "domain"))
    assert(before === after)
  }

  test("epoch admissions never exceed the cap even across many epochs") {
    val idx = Files.createTempDirectory("dc-idx5").toString
    IncrementalDomainCap.writeIndex(df((1L, "a.com")), "doc_id", "domain",
      idx, cap = 2, buckets = 0)
    for (e <- 1 to 4)
      IncrementalDomainCap.appendToIndex(
        df((100L * e, "a.com"), (100L * e + 1, "a.com")),
        "doc_id", "domain", idx, s"e$e")
    val total = spark.read.parquet(s"$idx/counts")
      .agg(sum("n_kept")).collect()(0).getLong(0)
    assert(total === 2L)
  }
}
