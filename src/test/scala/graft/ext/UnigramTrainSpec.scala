package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Distributed Unigram-LM training (hard EM + true-loss prune) — the
  * trainer is pinned to its pure sequential reference, and the Viterbi
  * backtrace to the frozen-vocabulary cost DP. */
class UnigramTrainSpec extends SparkSpecBase {

  // a small word-frequency table with shared substrings so the EM
  // rounds and the prune both have real work to do
  private val words = Seq(
    "stream" -> 40L, "streams" -> 25L, "steam" -> 18L, "dream" -> 15L,
    "read" -> 30L, "reader" -> 12L, "thread" -> 9L, "bread" -> 7L,
    "ample" -> 5L, "sample" -> 11L, "a" -> 50L)

  private def docsOf(wf: Seq[(String, Long)]) = {
    import spark.implicits._
    wf.zipWithIndex
      .map { case ((w, f), i) =>
        (i.toLong, Seq.fill(f.toInt)(w).mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("viterbiSeg cost equals encodeCost under the fixture vocabulary") {
    for (w <- Seq("customer", "stream", "filter", "the", "zz", "a",
        "window", "qqq")) {
      val (cp, pieces) = Unigram.viterbiSeg(w, Unigram.FixturePieces.toMap,
        Unigram.FixturePieces.map(_._1.length).max, onTrainingPath = false)
      assert(cp === Unigram.encodeCost(w), s"cost mismatch on '$w'")
      assert(pieces.mkString === w, s"segmentation must concatenate to '$w'")
      assert(pieces.length === (cp % Unigram.Scale), s"piece count on '$w'")
    }
  }

  test("excluding a used piece never lowers the cost") {
    val cs = Unigram.FixturePieces.toMap
    val ml = cs.keysIterator.map(_.length).max
    val (full, pieces) = Unigram.viterbiSeg("stream", cs, ml,
      onTrainingPath = false)
    for (x <- pieces.distinct if x.length >= 2) {
      val (alt, _) = Unigram.viterbiSeg("stream", cs, ml, exclude = x,
        onTrainingPath = false)
      assert(alt >= full)
    }
  }

  test("trainDistributed equals the sequential reference on the fixture") {
    val seqModel = Unigram.trainSequential(words,
      seedTopK = 16, emRounds = 2, keepK = 6)
    val distModel = Unigram.trainDistributed(docsOf(words), "doc_id", "text",
        seedTopK = 16, emRounds = 2, keepK = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(distModel === seqModel)
  }

  test("learned model tokenizes: every word segments, costs positive") {
    val model = Unigram.trainSequential(words,
      seedTopK = 16, emRounds = 2, keepK = 6).toMap
    assert(model.valuesIterator.forall(_ >= 1L))
    val ml = model.keysIterator.map(_.length).max
    for ((w, _) <- words) {
      val (_, pieces) = Unigram.viterbiSeg(w, model, ml)
      assert(pieces.mkString === w)
    }
    // the alphabet survived pruning (character coverage)
    val chars = words.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(model.keySet))
  }

  test("usage slices are a monoid: per-half merge equals whole-corpus usage") {
    import org.apache.spark.sql.functions._
    val d = docsOf(words)
    val model = Unigram.trainSequential(words,
      seedTopK = 16, emRounds = 2, keepK = 6).toMap
    val whole = Unigram.usageCounts(d, "doc_id", "text", model)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val h1 = Unigram.usageCounts(d.where(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text", model)
    val h2 = Unigram.usageCounts(d.where(pmod(col("doc_id"), lit(2)) === 1),
      "doc_id", "text", model)
    val merged = h1.unionByName(h2).groupBy("piece")
      .agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(merged === whole)
  }

  test("selftok counts are consistent with the learned model") {
    val d = docsOf(words)
    val modelDf = Unigram.trainDistributed(d, "doc_id", "text",
      seedTopK = 16, emRounds = 2, keepK = 6)
    val model = modelDf.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val out = Unigram.tokenCounts(d, "doc_id", "text", pieces = model)
    // every doc is `freq` repetitions of one word: n_tokens = freq and
    // total_cost = freq * that word's optimal raw cost
    val ml = model.keysIterator.map(_.length).max
    val rows = out.orderBy("doc_id").collect()
    for ((((w, f), i), r) <- words.zipWithIndex.zip(rows)) {
      assert(r.getLong(0) === i.toLong)
      assert(r.getLong(1) === f)
      val cp = Unigram.viterbiSeg(w, model, ml)._1
      assert(r.getLong(2) === f * (cp % Unigram.Scale))
      assert(r.getLong(3) === f * (cp / Unigram.Scale))
    }
  }

  test("maxWordLen bound fails loudly at the source, naming the pre-token") {
    // "streams" (7 chars) exceeds a bound of 6: with an oracle whose DP
    // unrolls only 6 levels the word would silently drop from the
    // oracle's final union — the trainer must refuse instead.
    val e = intercept[IllegalArgumentException] {
      Unigram.trainDistributed(docsOf(words), "doc_id", "text",
        seedTopK = 16, emRounds = 1, keepK = 6, maxWordLen = 6)
    }
    assert(e.getMessage.contains("exceeds maxWordLen=6"))
    assert(e.getMessage.contains("streams") || e.getMessage.contains("7 chars"))
    // at the true corpus bound the guard passes and training proceeds
    val ok = Unigram.trainDistributed(docsOf(words), "doc_id", "text",
      seedTopK = 16, emRounds = 1, keepK = 6, maxWordLen = 7)
    assert(ok.count() > 0)
  }
}
