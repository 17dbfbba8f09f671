package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-overlap decontamination: hand-checked hit counts, short-doc
  * zero rows, case folding, and the broadcast-join plan shape. */
class DecontaminationSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("contaminated doc flagged; clean doc not; hit counts exact") {
    // n=3 grams. Corpus doc 1 shares "b c d" with the bench; doc 2 none.
    val corpus = docs((1L, "a b c d"), (2L, "x y z w"))
    val bench = docs((100L, "b c d e"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toSeq ===
      Seq((1L, 2L, 1L, true), (2L, 2L, 0L, false)))
  }

  test("docs shorter than n kept with (0, 0, false)") {
    val corpus = docs((1L, "just two"), (2L, "one two three four"))
    val bench = docs((100L, "one two three"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_hits"))).toSeq === Seq((1L, 0L, 0L), (2L, 2L, 1L)))
  }

  test("grams are lowercased: case-variant copies still collide") {
    val corpus = docs((1L, "The Quick Brown Fox"))
    val bench = docs((100L, "the quick brown fox"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .collect()
    assert(out.length === 1 && out(0).getAs[Boolean]("contaminated"))
  }

  test("repeated gram in one doc counts once (distinct shingles)") {
    // "a b a b a b" with n=2 → distinct grams {a b, b a}; bench has "a b".
    val corpus = docs((1L, "a b a b a b"))
    val bench = docs((100L, "a b"))
    val out = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 2)
      .collect()
    assert(out(0).getAs[Long]("n_grams") === 2L)
    assert(out(0).getAs[Long]("n_hits") === 1L)
  }

  test("contaminatedIds equals the report's contaminated id set") {
    // Mixed corpus: a contaminated doc, a clean doc, a short (gram-less)
    // doc, and a doc contaminated through a repeated gram — the id-only
    // fast path (what cleanCorpus anti-joins on) must equal the full
    // report filtered to contaminated = true.
    val corpus = docs((1L, "a b c d"), (2L, "x y z w"), (3L, "hi"),
      (4L, "b c d b c d"))
    val bench = docs((100L, "b c d e"))
    val viaReport = Decontamination
      .decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .where(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val direct = Decontamination
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(direct === viaReport)
    assert(direct === Set(1L, 4L))
  }

  test("bloom path: report byte-equal to the exact path; sketch actually prunes") {
    // A corpus with one truly contaminated doc, one clean doc, and one
    // short doc — the bloom path must reproduce decontaminate() exactly
    // (false positives die in the verify join; no false negatives by
    // the Bloom contract).
    val corpus = docs((1L, "a b c d"), (2L, "x y z w"), (3L, "hi"))
    val bench = docs((100L, "b c d e"), (101L, "p q r s t"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // writeBloomIndex stores n in meta; rebuild flag path with n=3
    Decontamination.writeIndex(bench, "doc_id", "text", dir, n = 3)
    Decontamination.writeBloomIndex(bench, "doc_id", "text", dir, n = 3, fpp = 0.01)
    val exact = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().toSeq
    val bloom = Decontamination.flagWithBloom(spark, dir, corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(bloom === exact)
    // The sketch must answer true for every stored gram (no false
    // negatives) — probe it directly through the expression.
    val fs = new graft.util.TableFs(dir, spark.sparkContext.hadoopConfiguration)
    val grams = spark.read.parquet(fs.str("grams"))
    val nTrue = grams.where(graft.functions.BloomExpressions.mightContain(
      col("shingle"), fs.str("bloom/filter.bin"))).count()
    assert(nTrue === grams.count())
  }

  test("bloom prefilter drops non-member grams map-side (interpreted + codegen)") {
    val s = spark; import s.implicits._
    val bench = docs((100L, "b c d e"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom2").toString
    Decontamination.writeBloomIndex(bench, "doc_id", "text", dir, n = 3, fpp = 0.01)
    val fs = new graft.util.TableFs(dir, spark.sparkContext.hadoopConfiguration)
    val bloomPath = fs.str("bloom/filter.bin")
    // 2 member grams + 2000 distinct non-members: at fpp=1% the filter
    // must pass both members and almost none of the rest — a generous
    // 5% bound keeps the test deterministic-in-practice without pinning
    // the sketch's hash layout.
    val members = Seq("b c d", "c d e")
    val nonMembers = (0 until 2000).map(i => s"nm$i x y")
    val probes = (members ++ nonMembers).toDF("shingle")
    val kept = probes.where(graft.functions.BloomExpressions.mightContain(
      col("shingle"), bloomPath)).collect().map(_.getString(0)).toSet
    assert(members.forall(kept));
    assert(kept.size <= members.size + 100,
      s"bloom passed ${kept.size - members.size} of 2000 non-members (fpp=0.01)")
    // Interpreted eval must agree with codegen (nullSafeEval path).
    val hconf = new graft.util.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val expr = graft.functions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal("b c d"), bloomPath,
      hconf)
    assert(expr.eval(null) === true)
    val exprNo = graft.functions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal("definitely absent gram"),
      bloomPath, hconf)
    // not asserting false (could be a false positive in principle) —
    // just that it evaluates without error to a boolean
    assert(exprNo.eval(null).isInstanceOf[Boolean])
  }

  test("plan: bloom probe is a Filter BELOW the verify join (map-side prune)") {
    val corpus = docs((1L, "a b c d"), (2L, "x y z w"))
    val bench = docs((100L, "b c d e"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom3").toString
    Decontamination.writeBloomIndex(bench, "doc_id", "text", dir, n = 3)
    val plan = Decontamination.flagWithBloom(spark, dir, corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val lines = plan.split("\n")
    val probeLine = lines.indexWhere(_.contains("graft_bloom_might_contain"))
    assert(probeLine >= 0, s"bloom probe missing from plan:\n$plan")
    // the probe must sit strictly below (deeper than) every join — i.e.
    // some join appears ABOVE it in the operator tree dump
    val joinAbove = lines.take(probeLine).exists(l =>
      l.contains("Join") || l.contains("HashJoin"))
    assert(joinAbove,
      s"bloom probe is not below the verify join:\n$plan")
    // and no join may appear BELOW the probe (the filter feeds the join,
    // never the other way round)
    val joinBelow = lines.drop(probeLine + 1).exists(l =>
      l.contains("Join") || l.contains("HashJoin"))
    assert(!joinBelow,
      s"a join sits below the bloom probe — prefilter not map-side:\n$plan")
  }

  test("plan: bench side broadcast, corpus never shuffled before the join") {
    val corpus = docs((1L, "a b c d"), (2L, "x y z w"))
    val bench = docs((100L, "b c d e"))
    val plan = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join against the bench grams:\n$plan")
  }
}
