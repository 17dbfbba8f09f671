package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpecBase {

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    val s = spark; import s.implicits._
    Seq(text).toDF("text").select(c.as("v")).head().getAs[T]("v")
  }

  test("nWords: empty, blank, and multi-space inputs") {
    assert(one[Int](TextStats.nWords(col("text")), "") === 0)
    assert(one[Int](TextStats.nWords(col("text")), "   ") === 0)
    assert(one[Int](TextStats.nWords(col("text")), "a  b   c") === 3)
  }

  test("tokens: letter runs, digit runs, single punctuation") {
    assert(one[Seq[String]](TextStats.tokens(col("text")), "ab12, cd!") ===
      Seq("ab", "12", ",", "cd", "!"))
  }

  test("stopwordRatio and meanWordLen arithmetic") {
    assert(one[Double](TextStats.stopwordRatio(col("text")), "the cat in hat") === 0.5)
    assert(one[Double](TextStats.meanWordLen(col("text")), "ab cdef") === 3.0)
    assert(one[Double](TextStats.meanWordLen(col("text")), "") === 0.0)
  }

  test("langId: marker-based argmax with unk fallback") {
    assert(one[String](TextStats.langId(col("text")), "the cat and the dog is here") === "en")
    assert(one[String](TextStats.langId(col("text")), "el perro que corre con la gata") === "es")
    assert(one[String](TextStats.langId(col("text")), "le chien est avec le chat") === "fr")
    assert(one[String](TextStats.langId(col("text")), "xyz qqq zzz") === "unk")
  }

  test("langIdNgram: trigram-profile argmax with unk fallback and length guard") {
    assert(one[String](TextStats.langIdNgram(col("text")), "the thing and the king") === "en")
    assert(one[String](TextStats.langIdNgram(col("text")), "la casa de los niños") === "es")
    assert(one[String](TextStats.langIdNgram(col("text")), "le chat est sur le mur que") === "fr")
    assert(one[String](TextStats.langIdNgram(col("text")), "zz") === "unk") // < 3 chars
    assert(one[String](TextStats.langIdNgram(col("text")), "xxxx yyyy") === "unk")
  }

  test("ngram kernel windows over code points, matching substr semantics") {
    val s = spark; import s.implicits._
    // The emoji is a supplementary-plane char (2 UTF-16 code units, 1 code
    // point). Code-unit windowing would shift every window after it and
    // disagree with Spark substr / the DuckDB oracle.
    val texts = Seq("the 😀 king", "a😀the", "😀😀the ing and")
    val kernel = graft.functions.VectorExpressions.ngramProfileCount(
      col("text"), TextStats.TrigramProfiles.map(_._2))
    // Reference formulation: per-profile filter over the substr-built
    // trigram array (code-point semantics by construction).
    val ref = texts.toDF("text").select(
      array(TextStats.TrigramProfiles.map { case (_, grams) =>
        size(filter(TextStats.charTrigrams(col("text")),
          g => g.isin(grams.map(lit): _*))).cast("long")
      }: _*).as("slow"))
    val fast = texts.toDF("text").select(kernel.as("fast"))
      .collect().map(_.getSeq[Long](0))
    val slow = ref.collect().map(_.getSeq[Long](0))
    assert(fast.toSeq === slow.toSeq)
  }

  test("tfIdfTopTerms: hand-computed scores, deterministic tie ranks") {
    val s = spark; import s.implicits._
    // N=3 docs. Doc1: "cat" tf=2 df=1 → 2·3/1=6; "the" tf=2 df=3 → 2;
    // "sat" tf=1 df=2 → 1.5. Ties order by term.
    val docs = Seq(
      (1L, "the cat the cat sat"),
      (2L, "the dog sat"),
      (3L, "the bird")).toDF("doc_id", "text")
    val out = TextStats.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Double]("score"), r.getAs[Long]("rank")))
    assert(out.toSeq === Seq(
      (1L, "cat", 6.0, 1L), (1L, "the", 2.0, 2L),
      (2L, "dog", 3.0, 1L), (2L, "sat", 1.5, 2L),
      (3L, "bird", 3.0, 1L), (3L, "the", 1.0, 2L)))
  }

  test("repetitionStats: hand-computed counters, case folding, empty/blank docs") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, Option("a b a b a")),  // a:3 b:2; bigrams: "a b"x2 "b a"x2
      (2L, Option("x")),          // single word, no bigrams
      (3L, Option("")),           // empty → all zeros
      (4L, Option("   ")),        // blank → all zeros
      (5L, Option("The the THE")) // case-insensitive: the x3
    ).toDF("doc_id", "text")
      .unionByName(Seq((6L, Option.empty[String])).toDF("doc_id", "text"))
    val got = TextStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(got(0) === ((1L, 5L, 3L, 5L, 4L, 2L, 1.0, 0.5)))
    assert(got(1) === ((2L, 1L, 1L, 0L, 0L, 0L, 0.0, 0.0)))
    assert(got(2) === ((3L, 0L, 0L, 0L, 0L, 0L, 0.0, 0.0)))
    assert(got(3) === ((4L, 0L, 0L, 0L, 0L, 0L, 0.0, 0.0)))
    assert(got(4) === ((5L, 3L, 3L, 3L, 2L, 2L, 1.0, 1.0)))
    assert(got(5) === ((6L, 0L, 0L, 0L, 0L, 0L, 0.0, 0.0))) // null text → zeros
  }

  test("repetitionStats splits on RE2's \\s class: tab splits, vertical tab does not") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a\tb"),     // tab: two words in both engines
      (2L, "a\u000Bb")  // vertical tab: ONE token in RE2 (Java \s would split)
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").select("n_words").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L, 1L))
  }

  test("repetitionStats keeps trailing empty tokens, matching DuckDB regexp_split_to_array") {
    val s = spark; import s.implicits._
    // trim() is space-only in both engines, so text ending in \t\n\f\r keeps
    // its trailing separator and DuckDB emits an empty token after it:
    //   "a b\t" -> [a, b, ""]   "\ta b" -> ["", a, b]   "\t" -> ["", ""]
    // (behavior confirmed against DuckDB directly). Java's default split
    // drops trailing empties; the kernel uses limit -1 to match.
    val docs = Seq(
      (1L, "a b\t"),   // trailing tab: 3 words ("" once), bigrams "a b", "b "
      (2L, "\ta b"),   // leading tab: 3 words (already matched pre-fix)
      (3L, "\t"),      // bare tab survives space-trim: ["", ""] -> "" x2
      (4L, "a b \t ")  // space-trim eats the outer space; "\t" run remains
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got(0) === ((1L, 3L, 1L, 0L, 2L, 1L)))
    assert(got(1) === ((2L, 3L, 1L, 0L, 2L, 1L)))
    assert(got(2) === ((3L, 2L, 2L, 2L, 1L, 1L)))
    assert(got(3) === ((4L, 3L, 1L, 0L, 2L, 1L)))
  }

  test("cleanText collapses whitespace runs and trims") {
    assert(one[String](TextStats.cleanText(col("text")), "  a\t\tb \n c  ") === "a b c")
    assert(one[String](TextStats.cleanText(col("text")), "") === "")
  }

  test("vocabStats: hand-computed dictionary numbers") {
    val s = spark; import s.implicits._
    // terms: the(tf2,df2) cat(tf2,df1) sat(tf1,df1) dog(tf1,df1)
    val docs = Seq((1L, "the cat cat sat"), (2L, "the dog")).toDF("doc_id", "text")
    val r = TextStats.vocabStats(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_occurrences") === 6L)
    assert(r.getAs[Long]("n_distinct_terms") === 4L)
    assert(r.getAs[Long]("n_hapax_docfreq") === 3L) // cat, sat, dog
    assert(r.getAs[Long]("max_df") === 2L)
  }

  test("Column-level whitespace uses RE2's \\s class: \\x0B is NOT a separator") {
    val s = spark; import s.implicits._
    // Java \s matches vertical tab; RE2's (the oracle's) does not. The
    // Column-level ops must match the oracle: "a\u000Bb" is ONE word,
    //   tokenizes as punctuation, and cleanText keeps it.
    val df = Seq("a\u000Bb", "a\tb").toDF("text")
    val r = df.select(
      TextStats.nWords(col("text")).as("w"),
      TextStats.nTokens(col("text")).as("t"),
      TextStats.punctRatio(col("text")).as("p"),
      TextStats.cleanText(col("text")).as("c")).collect()
    assert(r(0).getAs[Int]("w") === 1, "\\x0B must not split words")
    assert(r(0).getAs[Int]("t") === 3) // a, \x0B (punct), b
    assert(r(0).getAs[Double]("p") === 0.333333)
    assert(r(0).getAs[String]("c") === "a\u000Bb", "cleanText must not collapse \\x0B")
    assert(r(1).getAs[Int]("w") === 2, "tab still splits")
    assert(r(1).getAs[Int]("t") === 2) // a, b — tab is whitespace, not punct
    assert(r(1).getAs[String]("c") === "a b")
  }

  test("qualityScore stays in [0,1]") {
    val s = spark; import s.implicits._
    val texts = Seq("", "short", "a" * 500,
      "the quick brown fox jumps over the lazy dog and keeps running through the field")
    val scores = texts.toDF("text")
      .select(TextStats.qualityScore(col("text")).as("q")).collect().map(_.getDouble(0))
    assert(scores.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("vocabCoverage: hand-computed Zipf curve, ties broken by term") {
    val s = spark; import s.implicits._
    // 10 words total: "a"×5, "b"×3, "c"×1, "d"×1 (c before d on ties)
    val d = Seq("a a A b", "a b B c", "a d").toDF("text")
    val got = TextStats.vocabCoverage(d, "text", topN = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "a", 5L, 500000L),
      (2L, "b", 3L, 800000L),
      (3L, "c", 1L, 900000L)))
  }

  test("vocabCoverage: last cumulative point of a full curve hits 1e6 exactly") {
    val s = spark; import s.implicits._
    val d = Seq("x y z", "x y", "x").toDF("text")
    val all = TextStats.vocabCoverage(d, "text", topN = 10)
      .orderBy("rank").collect()
    assert(all.last.getAs[Long]("cum_ppm") === 1000000L)
  }
}
