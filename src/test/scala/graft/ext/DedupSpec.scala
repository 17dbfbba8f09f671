package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup family: shingle edge cases, exact-Jaccard hand checks, MinHash
  * recall vs the exact baseline, SimHash blocking completeness. */
class DedupSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: docs shorter than n yield no shingles (no crash)") {
    val d = docs((1L, "one"), (2L, "two words"), (3L, "a b c d"))
    val sh = Dedup.shingles(d, "doc_id", "text", n = 3)
    val byDoc = sh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byDoc.contains(1L) && !byDoc.contains(2L))
    assert(byDoc(3L) === 2L) // "a b c", "b c d"
  }

  test("exact dedup: min-id survivor and copy count") {
    val d = docs((5L, "same text"), (2L, "same text"), (9L, "other"))
    val out = Dedup.exact(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_copies"))).toSeq ===
      Seq((2L, 2L), (9L, 1L)))
  }

  test("jaccardPairs: hand-computed intersection/union") {
    // A: {a b c, b c d}; B: {b c d, c d e} → inter 1, union 3 → 1/3
    val d = docs((1L, "a b c d"), (2L, "b c d e"))
    val out = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.3).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("jaccard") === 0.333333)
  }

  test("jaccardPairs: maxDf drops near-universal shingles (hot-bucket cap)") {
    // every doc shares "x y z"; with maxDf=2 that shingle is dropped so
    // the only surviving pair is the one with another common shingle
    val d = docs((1L, "x y z a b c"), (2L, "x y z d e f"), (3L, "x y z a b c"))
    val capped = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.2, maxDf = 2)
      .collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 3L)))
  }

  test("jaccardPairs: a universal shingle stays candidate-bounded under maxDf") {
    // 60 docs whose ONLY shared shingle is universal boilerplate: uncapped,
    // the inverted index pairs all of them (60·59/2 = 1770 candidates);
    // capped, the hot bucket is dropped and the candidate set is EMPTY.
    val d = docs((1L to 60L).map(i => i -> s"common header shingle unique$i a$i b$i"): _*)
    val uncapped = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.0)
    assert(uncapped.count() === 60L * 59 / 2)
    val capped = Dedup.jaccardPairs(d, "doc_id", "text", n = 3,
      threshold = 0.0, maxDf = 10)
    assert(capped.count() === 0)
  }

  test("connected components: chains, stars, and singleton-free node set") {
    val s = spark; import s.implicits._
    // chain 1-2-3-4 (diameter > 1 forces real iteration), star 10<-{11,12,13},
    // isolated pair 20-21; node 99 appears nowhere
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 10L),
      (10L, 13L), (20L, 21L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long path converges within the iteration bound") {
    val s = spark; import s.implicits._
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(cc.size === 40 && cc.values.forall(_ == 1L))
  }

  test("connected components: 10k-node path pins the convergence bound with round count") {
    // The adversarial diameter case: a pure path of 10,001 nodes. Star
    // contraction roughly halves the effective diameter per round; the
    // measured cost is 15 rounds (log2(10000) ≈ 13.3 + fixpoint
    // detection) — this test pins that contraction rate, and the default
    // maxIter = 32 keeps 2× headroom over it. The observed count is
    // named in every assertion so a future regression reports HOW slow
    // it got, not just that it blew the bound.
    val s = spark; import s.implicits._
    val pairs = (0L until 10000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (ccDf, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    info(s"10k-node path converged in $rounds rounds (maxIter default 32)")
    val comps = ccDf.select("comp").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq === Seq(0L),
      s"10k path must collapse to one component rooted at 0 (rounds: $rounds)")
    assert(ccDf.count() === 10001L, s"every node must be labeled (rounds: $rounds)")
    assert(rounds <= 16,
      s"10k-node path took $rounds large-star/small-star rounds (measured 15); " +
        "the contraction rate regressed — investigate before trusting maxIter = 32")
  }

  test("CC corpus dedup collapses non-clique clusters greedy pair-drop over-keeps") {
    // A~C and B~C with no A~B pair: greedy drops only C (the id_b loser),
    // keeping both A and B; CC keeps exactly the component min A.
    val s = spark; import s.implicits._
    val d = docs((1L, "doc a"), (2L, "doc b"), (3L, "doc c"), (9L, "unrelated"))
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val greedy = Dedup.dedupedCorpus(d, "doc_id", "text", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cc = Dedup.dedupedCorpusCC(d, "doc_id", "text", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(greedy === Set(1L, 2L, 9L)) // the documented under-collapse
    assert(cc === Set(1L, 9L))
  }

  test("minhash near-dups: subset of exact pairs with recall >= 0.9 on real docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.jaccardPairs(real, "doc_id", "text", n = 3, threshold = 0.12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashNearDups(real, "doc_id", "text", n = 3,
        bands = 16, rows = 4, threshold = 0.12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact), "verified candidates must be exact pairs")
    assert(exact.nonEmpty)
    val recall = mh.size.toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall $recall < 0.9 (${mh.size}/${exact.size})")
  }

  test("prefix-filtered jaccard: identical pair set to the full join across thresholds") {
    // Deterministic word-soup corpus with planted near-dups: doc i and
    // i+100 share a long common run, so pairs exist at every threshold.
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"w$i")
    def soup(k: Int) = Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 80L).map(i => i -> soup(30))
    val mutated = base.take(30).map { case (i, t) =>
      (i + 100L) -> (t.split(' ').take(25).mkString(" ") + " " + soup(5))
    }
    val d = docs((base ++ mutated): _*)
    for (t <- Seq(0.12, 0.3, 0.5, 0.8)) {
      def pairSet(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
      val full = pairSet(Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = t))
      val pre = pairSet(Dedup.jaccardPairsPrefix(d, "doc_id", "text", n = 3, threshold = t))
      assert(pre === full, s"threshold $t: prefix-filtered pair set diverged")
      if (t <= 0.3) assert(full.nonEmpty, s"threshold $t: fixture produced no pairs")
    }
  }

  test("prefix-filtered jaccard: equivalence holds under the maxDf cap too") {
    val d = docs((1L, "x y z a b c d"), (2L, "x y z d e f g"), (3L, "x y z a b c h"),
      (4L, "p q r s t u v"), (5L, "p q r s t u w"))
    for (cap <- Seq(2L, 10L, Long.MaxValue)) {
      val full = Dedup.jaccardPairs(d, "doc_id", "text", n = 3,
        threshold = 0.2, maxDf = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
      val pre = Dedup.jaccardPairsPrefix(d, "doc_id", "text", n = 3,
        threshold = 0.2, maxDf = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
      assert(pre === full, s"maxDf=$cap: prefix-filtered pair set diverged")
    }
  }

  test("prefix index: keeps exactly |d| - ceil(t|d|) + 1 rarest shingles per doc") {
    // 10 distinct words → 8 distinct 3-gram shingles; t=0.5 → prefix
    // length 8 - 4 + 1 = 5.
    val d = docs((1L, (0 until 10).map(i => s"u$i").mkString(" ")))
    val sh = Dedup.shingles(d, "doc_id", "text", n = 3)
    val pre = Dedup.prefixShingles(sh, "doc_id", threshold = 0.5)
    assert(pre.count() === 5L)
    // and at t→1.0 only a single shingle survives (n - n + 1)
    assert(Dedup.prefixShingles(sh, "doc_id", threshold = 1.0).count() === 1L)
  }

  test("prefix filter: candidate count strictly shrinks on a shared-token corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.shingles(real, "doc_id", "text", n = 3)
    val fullCands = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), "shingle")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count()
    val preCands = Dedup.prefixCandidates(
      Dedup.prefixShingles(sh, "doc_id", 0.12), "doc_id", 0.12).count()
    assert(preCands < fullCands,
      s"prefix candidates $preCands not below full $fullCands")
    // and the real-corpus pair set still matches the unfiltered join
    val full = Dedup.jaccardPairs(real, "doc_id", "text", n = 3, threshold = 0.12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pre = Dedup.jaccardPairsPrefix(real, "doc_id", "text", n = 3, threshold = 0.12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pre === full)
  }

  test("simhash: identical docs get identical fingerprints, disjoint docs differ") {
    val d = docs((1L, "spark scala window merge"), (2L, "spark scala window merge"),
      (3L, "entirely different content here"))
    val fp = Dedup.simhash(d, "doc_id", "text").orderBy("doc_id").collect()
      .map(_.getAs[Long]("simhash"))
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }

  test("simhash blocking: every pair within the Hamming ball is found, outside is rejected") {
    val s = spark; import s.implicits._
    val base = 0x0123456789abcdefL
    val fps = Seq(
      (1L, base),
      (2L, base ^ 1L),                    // hamming 1
      (3L, base ^ (1L << 17) ^ (1L << 40) ^ (1L << 63)), // hamming 3
      (4L, base ^ 0x0fL),                 // hamming 4 → outside ball 3
    ).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashNearDups(fps, "doc_id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L)))
    // fp2 vs fp3: hamming 4 → also rejected
    assert(!pairs.contains((2L, 3L)))
  }
}
