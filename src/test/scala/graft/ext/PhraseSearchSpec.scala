package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PhraseSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def phrases(rows: (Long, String)*): DataFrame =
    rows.toDF("phrase_id", "phrase")

  private def counts(d: DataFrame, p: DataFrame): Seq[(Long, Long, Long, Long)] =
    PhraseSearch.phraseCounts(d, "doc_id", "text", p)
      .select("phrase_id", "doc_id", "n_occurrences", "first_pos")
      .orderBy("phrase_id", "doc_id")
      .as[(Long, Long, Long, Long)].collect.toSeq

  test("overlapping runs count every start position") {
    // "a a a a" contains "a a" at positions 1, 2, 3
    val got = counts(docs(1L -> "a a a a"), phrases(1L -> "a a"))
    assert(got === Seq((1L, 1L, 3L, 1L)))
  }

  test("normalization: case folds, whitespace runs collapse, trim applies") {
    val d = docs(1L -> "  The  QUICK\tfox  ", 2L -> "the quick fox again")
    val got = counts(d, phrases(1L -> "THE quick  FOX"))
    assert(got === Seq((1L, 1L, 1L, 1L), (1L, 2L, 1L, 1L)))
  }

  test("a phrase is matched word-exactly, never as a substring") {
    val d = docs(1L -> "class act", 2L -> "classes acting")
    val got = counts(d, phrases(1L -> "class act"))
    assert(got === Seq((1L, 1L, 1L, 1L)))
  }

  test("first_pos is the earliest start; multiple phrases share lengths") {
    val d = docs(1L -> "x y z x y")
    val got = counts(d, phrases(1L -> "x y", 2L -> "y z"))
    assert(got === Seq((1L, 1L, 2L, 1L), (2L, 1L, 1L, 2L)))
  }

  test("stats includes zero-match phrases; empty text is safe") {
    val d = docs(1L -> "a b", 2L -> "", 3L -> "   ")
    val got = PhraseSearch.phraseStats(d, "doc_id", "text",
        phrases(1L -> "a b", 2L -> "zz qq"))
      .orderBy("phrase_id")
      .as[(Long, String, Long, Long)].collect.toSeq
    assert(got === Seq((1L, "a b", 1L, 1L), (2L, "zz qq", 0L, 0L)))
  }

  test("gram text never crosses a shuffle (fingerprints key the agg)") {
    val d = docs(1L -> "a b c")
    val plan = PhraseSearch.phraseCounts(d, "doc_id", "text",
        phrases(1L -> "a b")).queryExecution.executedPlan.toString
    // the only hash aggregate keys on (phrase_id, doc_id); the gram
    // string appears before the broadcast fp join only
    val aggKeys = "HashAggregate\\(keys=\\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(aggKeys.nonEmpty &&
      aggKeys.forall(k => !k.contains("gram")),
      s"gram text must not key any aggregate:\n$plan")
  }

  test("registered fixture: sf0.001 coverage incl. per-doc repeats") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import spark.implicits._
    val p = graft.queries.LlmQueries.PhraseFixture.toDF("phrase_id", "phrase")
    val got = PhraseSearch.phraseStats(d, "doc_id", "text", p)
      .orderBy("phrase_id")
      .as[(Long, String, Long, Long)].collect.toSeq
    // measured: "slow slow" 22 occ / 20 docs, "window fast query" 3/3,
    // "spark window" 40/35, zero-arm and (at this sf) phrase 1 empty
    assert(got.map(t => (t._1, t._3, t._4)) === Seq(
      (1L, 0L, 0L), (2L, 20L, 22L), (3L, 3L, 3L), (4L, 0L, 0L),
      (5L, 35L, 40L)))
    assert(got(4)._2 === "spark window") // normalization arm
  }
}
