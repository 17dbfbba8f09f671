package graft.ext

import graft.SparkSpecBase

class UnigramSpec extends SparkSpecBase {

  private val pm = Unigram.FixturePieces.toMap
  private val lMax = Unigram.FixturePieces.map(_._1.length).max

  /** Brute-force optimum: enumerate EVERY segmentation (all
    * compositions of the word) and take the min cost' — the ground
    * truth the Viterbi DP must match. */
  private def brute(word: String): Long = {
    def go(i: Int): Long =
      if (i == word.length) 0L
      else (1 to math.min(word.length - i, math.max(lMax, 1))).flatMap { l =>
        val piece = word.substring(i, i + l)
        val cost =
          if (l == 1) Some(pm.getOrElse(piece, Unigram.UnkCost))
          else pm.get(piece)
        cost.map(c => Unigram.Scale * c + 1 + go(i + l))
      }.min
    go(0)
  }

  test("Viterbi equals brute-force enumeration on every probe word") {
    val probes = Seq("a", "dup", "stream", "customer", "filter", "vector",
      "window", "join", "the", "zzz", "2024", "aerer", "stst", "qux",
      "columnar", "sortorder")
    probes.foreach { w =>
      assert(Unigram.encodeCost(w) === brute(w), s"diverged on '$w'")
    }
  }

  test("known segmentations: subword paths, whole words, unk digits") {
    def nc(w: String) = {
      val cp = Unigram.encodeCost(w)
      (cp % Unigram.Scale, cp / Unigram.Scale)
    }
    assert(nc("stream") === ((3L, 28L)))   // st + re + am
    assert(nc("dup") === ((2L, 23L)))      // d + up
    assert(nc("join") === ((1L, 20L)))     // whole word beats chars
    assert(nc("a") === ((1L, 13L)))        // char piece beats the 20-cost word
    assert(nc("2024") === ((4L, 160L)))    // digits are all <unk>
    assert(nc("") === ((0L, 0L)))
  }

  test("epsilon folds the fewest-pieces tie-break into the integer") {
    // two equal-raw-cost segmentations must resolve to the FEWER-pieces
    // one via the +1-per-piece term: craft 'erer' — er+er (2×9=18+2eps)
    // vs e+r+e+r (4×13) — unambiguous anyway; the structural assertion
    // is that cost' mod Scale is exactly the piece count of the optimum
    val cp = Unigram.encodeCost("erer")
    assert(cp === 2 * (Unigram.Scale * 9 + 1))
  }

  test("tokenCounts matches a driver-side recompute on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Unigram.tokenCounts(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tokRe = TextStats.TokenRe.r
    val want = docs.select("doc_id", "text").orderBy("doc_id").collect()
      .map { r =>
        val ws = tokRe.findAllIn(Option(r.getString(1)).getOrElse("")).toSeq
        val cps = ws.map(Unigram.encodeCost(_))
        (r.getLong(0), ws.size.toLong,
          cps.map(_ % Unigram.Scale).sum, cps.map(_ / Unigram.Scale).sum)
      }
    assert(got.toSeq === want.toSeq)
    // the deliberately-absent words really exercise multi-piece paths
    assert(got.exists(t => t._3 > t._2), "some words must split into >1 piece")
  }

  test("count kernel is map-side: no shuffle in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Unigram.tokenCounts(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenCounts must not shuffle:\n$plan")
  }

  test("a pre-token at the piece bound fails loud") {
    intercept[IllegalArgumentException] {
      Unigram.encodeCost("x" * Unigram.Scale.toInt)
    }
  }
}
