package graft.ext

import graft.SparkSpecBase

class WordPieceSpec extends SparkSpecBase {

  private def count(w: String, start: Set[String], cont: Set[String]) =
    WordPiece.encodeCount(w, start, cont,
      (start ++ cont).map(_.length).foldLeft(1)(math.max))

  test("greedy longest-match: hand-computed segmentations") {
    val start = Set("h", "a", "s", "i", "n", "g", "hash", "hashi")
    val cont = Set("h", "a", "s", "i", "n", "g", "ing", "shing")
    // hashing: start 'hashi' (len 5 beats 'hash') then '##n' '##g' = 3
    assert(count("hashing", start, cont) === 3L)
    // ashing: 'a' + longest cont 'shing' = 2
    assert(count("ashing", start, cont) === 2L)
    // hash: 'hash' = 1
    assert(count("hash", start, cont) === 1L)
  }

  test("position classes are consulted: asymmetric vocab changes the segmentation") {
    val sym = Set("a", "b", "ab")
    // symmetric: abab = 'ab' + '##ab' = 2
    assert(count("abab", sym, sym) === 2L)
    // 'ab' valid only word-initially: abab = 'ab' + '##a' + '##b' = 3
    assert(count("abab", sym, Set("a", "b")) === 3L)
    // 'ab' valid only as continuation: abab = 'a' + '##b'? no — greedy
    // takes '##bab'? not in vocab: 'a' + '##b' + '##ab' = 3
    assert(count("abab", Set("a", "b"), sym) === 3L)
  }

  test("[UNK] collapse: any dead end makes the whole word one token") {
    val start = Set("a", "b")
    val cont = Set("a", "b")
    assert(count("abxab", start, cont) === 1L) // 'x' unreachable
    assert(count("xab", start, cont) === 1L)   // dead at position 0
    assert(count("abx", start, cont) === 1L)   // dead at the end
  }

  test("tokenCounts: per-doc pre-token and WordPiece counts over the fixture vocab") {
    val s = spark; import s.implicits._
    // 'join' and 'hash' are fixture words (likely single pieces after
    // 32 merges); the pre-token count is exact regardless
    val d = Seq((1L, "join hash join"), (2L, ""), (3L, "join,")).toDF("doc_id", "text")
    val got = WordPiece.tokenCounts(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got(0)._2 === 3L && got(1)._2 === 0L && got(2)._2 === 2L)
    // fixture charset covers all letters here → no UNK, counts >= 1/token
    assert(got(0)._3 >= 3L && got(1)._3 === 0L && got(2)._3 >= 2L)
    // full fixture words segment to ONE piece each (they are merge results)
    val one = WordPiece.tokenCounts(Seq((9L, "join")).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(one.getLong(2) === 1L)
  }

  test("deterministic across partitionings") {
    val s = spark; import s.implicits._
    val rows = (0L until 200L).map(i => (i, s"hash${i % 7} the customer row $i"))
    def run(parts: Int) =
      WordPiece.tokenCounts(rows.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(run(2) === run(11))
  }
}
