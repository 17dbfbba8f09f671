package graft.ext

import graft.SparkSpecBase

/** BPE tokenizer: round-trip identity, equivalence of the rank-ordered
  * single-pass encoder with the reference min-rank priority loop, and
  * the DataFrame count kernel against a driver-side recompute. */
class BpeSpec extends SparkSpecBase {

  private val merges = Bpe.FixtureMerges

  /** The reference encoder (Sennrich subword-nmt shape): repeatedly
    * find the LOWEST-RANK adjacent pair present and merge all its
    * occurrences, until none remains. */
  private def referenceEncode(word: String): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var continue = true
    while (continue && syms.length > 1) {
      val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) continue = false
      else {
        val (a, b) = present.minBy(_._2)._1
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (syms(i) + syms(i + 1)); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  // deterministic pseudo-words over the fixture charset, including
  // repeats (aaa…) that stress leftmost-non-overlap handling
  private def words: Seq[String] = {
    val vocab = Bpe.FixtureWordFreq.map(_._1)
    val synthetic = (0 until 200).map { i =>
      val len = 1 + (i * 7919) % 12
      (0 until len).map(j => ('a' + ((i * 31 + j * j * 17) % 26)).toChar).mkString
    }
    val runs = Seq("aaaa", "aaa", "llll", "ststst", "erer", "aballe")
    vocab ++ synthetic ++ runs
  }

  test("decode is the exact inverse of encode on every probe word") {
    for (w <- words) assert(Bpe.decode(Bpe.encode(w, merges)) === w)
  }

  test("rank-ordered single-pass encode equals the min-rank reference loop") {
    for (w <- words)
      assert(Bpe.encode(w, merges) === referenceEncode(w), s"word '$w'")
  }

  test("training is deterministic and merges actually compress the vocab") {
    assert(Bpe.train(Bpe.FixtureWordFreq, Bpe.FixtureNMerges) === merges)
    assert(merges.size === Bpe.FixtureNMerges)
    val vocabTokens = Bpe.FixtureWordFreq.map { case (w, _) =>
      Bpe.encode(w, merges).length
    }.sum
    val chars = Bpe.FixtureWordFreq.map(_._1.length).sum
    assert(vocabTokens < chars,
      s"32 merges should compress the training vocab: $vocabTokens vs $chars")
  }

  test("tokenCounts matches a driver-side recompute, empty text included") {
    val s = spark; import s.implicits._
    val rows = Seq((0L, "customer query fast"), (1L, ""), (2L, "a"),
      (3L, "stream merge stream"), (4L, null.asInstanceOf[String]))
    val got = Bpe.tokenCounts(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val re = TextStats.TokenRe.r
    for ((id, t) <- rows) {
      val toks = re.findAllIn(Option(t).getOrElse("")).toSeq
      val want = (toks.size.toLong,
        toks.map(w => Bpe.encode(w, merges).length.toLong).sum)
      assert(got(id) === want, s"doc $id")
    }
  }

  test("count kernel is map-side: no shuffle in the plan") {
    val s = spark; import s.implicits._
    val p = Bpe.tokenCounts(Seq((1L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"BPE count should not shuffle:\n$p")
  }
}
