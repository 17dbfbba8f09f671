package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-computed Laplace bits on a one-doc corpus") {
    // "aaab": trigrams aaa, aab; bigrams aa, aa, ab; charset {a,b} V=2
    // bits(aaa) = bitlen(C(aa)+V) - bitlen(C(aaa)+1) = bitlen(4)-bitlen(2) = 1
    // bits(aab) = bitlen(C(aa)+V) - bitlen(C(aab)+1) = 3 - 2 = 1
    val r = NgramLm.selfScore(df(1L -> "aaab"), "doc_id", "text")
      .collect().head
    assert(r.getLong(1) === 2L)     // n_trigrams
    assert(r.getLong(2) === 2L)     // total_bits
    assert(r.getDouble(3) === 1.0)  // bits_per_trigram
  }

  test("docs shorter than 3 chars produce no score row") {
    val out = NgramLm.selfScore(df(1L -> "ab", 2L -> "abcd"), "doc_id", "text")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("junk text scores more bits than in-distribution text") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = NgramLm.train(real, "text")
    val probe = df(
      1L -> "table scan fast row value part key merge batch window",
      2L -> "zq jxq vkpzw qjzzx wqkv zzpqj xkwzv pqzkj")
    val out = NgramLm.score(probe, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(3) < out(1).getDouble(3),
      s"fluent ${out(0).getDouble(3)} !< junk ${out(1).getDouble(3)}")
  }

  test("unseen trigrams and contexts fall back to the smoothed floor") {
    // model trained on a/b text; scored text uses chars the model never
    // saw -> C(t)=0, C(ctx)=0, bits = bitlen(V) - bitlen(1) per trigram
    val model = NgramLm.train(df(1L -> "aaab"), "text") // V=2
    val out = NgramLm.score(df(9L -> "xyzw"), "doc_id", "text", model)
      .collect().head
    assert(out.getLong(1) === 2L)
    assert(out.getLong(2) === 2L) // 2 trigrams x (bitlen(2)-bitlen(1)) = 1
  }

  test("the integer-bit cost is within 1 bit of -log2(p), exhaustively") {
    // bits = bitlen(c2+V) - bitlen(c3+1) vs true -log2((c3+1)/(c2+V)):
    // for any positive integers a=c3+1 <= b=c2+V,
    // bits = floor(log2 b) - floor(log2 a) in [-log2(a/b) - 1 + eps,
    // -log2(a/b) + 1 - eps] — the claim the scaladoc discloses. Checked
    // over every (a, b) pair up to 512 (covers multiple octaves).
    for (b <- 1 to 512; a <- 1 to b) {
      val bits = (63 - java.lang.Long.numberOfLeadingZeros(b.toLong)) -
        (63 - java.lang.Long.numberOfLeadingZeros(a.toLong))
      val trueBits = -math.log(a.toDouble / b.toDouble) / math.log(2.0)
      assert(math.abs(bits - trueBits) < 1.0,
        s"a=$a b=$b bits=$bits true=$trueBits")
    }
  }

  test("lowercasing: scores are case-insensitive") {
    val a = NgramLm.selfScore(df(1L -> "The Table"), "doc_id", "text").collect()
    val b = NgramLm.selfScore(df(1L -> "the table"), "doc_id", "text").collect()
    assert(a.toSeq === b.toSeq)
  }
}
