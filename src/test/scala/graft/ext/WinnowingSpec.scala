package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Winnowing guarantees (SIGMOD'03): shared substrings of length >=
  * k+w-1 share a fingerprint; identical docs fingerprint identically;
  * short docs yield nothing. */
class WinnowingSpec extends SparkSpecBase {

  private def fps(text: String, k: Int = 8, w: Int = 4): Set[Long] = {
    val s = spark; import s.implicits._
    Seq(text).toDF("text")
      .select(explode(Winnowing.fingerprintArray(col("text"), k, w)).as("f"))
      .collect().map(_.getLong(0)).toSet
  }

  test("identical docs produce identical fingerprint sets; case-insensitive") {
    val a = fps("The quick brown fox jumps over the lazy dog")
    val b = fps("the quick brown fox jumps over the lazy dog")
    assert(a === b && a.nonEmpty)
  }

  test("docs shorter than k+w-1 yield no fingerprints") {
    assert(fps("tiny", k = 8, w = 4).isEmpty)
    assert(fps("exactly11ch", k = 8, w = 4).nonEmpty) // 11 = k+w-1
  }

  test("a shared substring of length >= k+w-1 guarantees a shared fingerprint") {
    val shared = "identical-segment-here"
    val a = fps(s"prefix-aaa $shared suffix-bbb")
    val b = fps(s"zzz-other $shared completely-different-tail")
    assert((a intersect b).nonEmpty)
  }

  test("disjoint-alphabet docs share nothing") {
    val a = fps("aaaa bbbb cccc dddd eeee ffff")
    val b = fps("gggg hhhh iiii jjjj kkkk llll")
    assert((a intersect b).isEmpty)
  }

  test("sharedFingerprintPairs finds the plagiarized pair only") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the original document text with a very distinctive long passage inside it"),
      (2L, "a copy embedding the very distinctive long passage inside it plus new words"),
      (3L, "zqx wvu entirely unrelated material nothing matching whatsoever qqzz")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.sharedFingerprintPairs(docs, "doc_id", "text", minShared = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
