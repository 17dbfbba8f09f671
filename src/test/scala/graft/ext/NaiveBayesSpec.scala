package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpecBase {

  private def df(rows: (Long, String, Boolean)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text", "lab")
  }

  test("hand-computed Laplace bits on a two-doc corpus") {
    // pos doc: "good good fine"  -> c_pos: good=2, fine=1; T_pos=3
    // neg doc: "bad junk"        -> c_neg: bad=1, junk=1;  T_neg=2
    // vocab V=4 (good fine bad junk)
    // score("good") = [bitlen(T_neg+V) - bitlen(c_neg+1)]
    //               - [bitlen(T_pos+V) - bitlen(c_pos+1)]
    //               = [bitlen(6)-bitlen(1)] - [bitlen(7)-bitlen(3)]
    //               = (3-1) - (3-2) = 1
    val corpus = df((1L, "good good fine", true), (2L, "bad junk", false))
    val model = NaiveBayes.train(corpus, "text", "lab")
    val out = NaiveBayes.score(df((9L, "good", true)), "doc_id", "text",
      model).collect().head
    assert(out.getLong(1) === 1L)   // n_tokens
    assert(out.getLong(2) === 1L)   // score_bits
    assert(out.getBoolean(3))       // predicted positive
  }

  test("class-exclusive tokens drive the sign of the score") {
    val corpus = df(
      (1L, "alpha alpha beta", true), (2L, "alpha beta gamma", true),
      (3L, "zork zork quux", false), (4L, "zork quux blee", false))
    val model = NaiveBayes.train(corpus, "text", "lab")
    val out = NaiveBayes.score(
        df((10L, "alpha beta", true), (11L, "zork quux", true)),
        "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) > 0 && out(0).getBoolean(3),
      s"pos-vocab doc scored ${out(0).getLong(2)}")
    assert(out(1).getLong(2) < 0 && !out(1).getBoolean(3),
      s"neg-vocab doc scored ${out(1).getLong(2)}")
  }

  test("unseen tokens cost the smoothed floor in BOTH classes") {
    // a token absent from the model contributes
    // [bitlen(T_neg+V)-bitlen(1)] - [bitlen(T_pos+V)-bitlen(1)] —
    // zero when the class totals share a bit-length (balanced corpus).
    val corpus = df((1L, "aa bb", true), (2L, "cc dd", false)) // T=2+2, V=4
    val model = NaiveBayes.train(corpus, "text", "lab")
    val out = NaiveBayes.score(df((9L, "zz zz", true)), "doc_id", "text",
      model).collect().head
    assert(out.getLong(1) === 2L)
    assert(out.getLong(2) === 0L) // bitlen(6)-bitlen(1) cancels per class
  }

  test("docs with no tokens produce no score row") {
    val corpus = df((1L, "aa bb", true), (2L, "cc", false))
    val model = NaiveBayes.train(corpus, "text", "lab")
    val out = NaiveBayes.score(df((5L, "   ", true), (6L, "aa", true)),
      "doc_id", "text", model)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(6L))
  }

  test("incremental summed model == full retrain, exactly") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("lab", TextStats.stopwordRatio(col("text")) >= 0.02)
    val base = real.where(col("doc_id") % 10 =!= 0)
    val shard = real.where(col("doc_id") % 10 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nb-inc").toString
    IncrementalNaiveBayes.writeIndex(base, "text", "lab", dir)
    IncrementalNaiveBayes.appendToIndex(shard, "text", "lab", dir, "shard1")
    val inc = IncrementalNaiveBayes
      .score(spark, dir, real, "doc_id", "text")
    val full = NaiveBayes.score(real, "doc_id", "text",
      NaiveBayes.train(real, "text", "lab"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    // compaction folds epochs without changing the model
    IncrementalNaiveBayes.compact(spark, dir)
    val post = IncrementalNaiveBayes
      .score(spark, dir, real, "doc_id", "text")
    assert(post.exceptAll(full).isEmpty && full.exceptAll(post).isEmpty)
  }

  test("the model side of the score join is broadcast") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("lab", col("n_chars") <= 450)
    val plan = NaiveBayes.score(real, "doc_id", "text",
        NaiveBayes.train(real, "text", "lab"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "document stream must not shuffle on the token for the model join")
  }
}
