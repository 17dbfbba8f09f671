package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) — the
  * tokenizer family real pretraining pipelines budget by (GPT-2/LLaMA
  * vocabularies are BPE merges). [[Packing]] budgets regex tokens;
  * the `llm_pack_stats_bpe` twin budgets BPE tokens against a
  * fixture-trained merge table, which is what a token-exact data
  * layout actually needs.
  *
  * Determinism (the cross-engine gate): training breaks pair-count
  * ties lexicographically, and ENCODING applies merges in rank order,
  * one leftmost-non-overlapping pass per rank. One-pass-per-rank is
  * equivalent to the reference min-rank priority loop: a merge at rank
  * k can only create pairs involving its new symbol, and any LEARNED
  * pair containing that symbol was necessarily learned after rank k —
  * so later ranks never re-enable earlier ones. The same pass is
  * restatable as a chain of SQL `replace()` calls over a marked symbol
  * string (`U+0001sym␠` per symbol — [[sqlTokenCount]]), which is how
  * the DuckDB oracle recomputes every token count bit-for-bit.
  *
  * Scale shape: encoding is pure map-side per-row work; the merge
  * table is a plan-shipped constant (a real 50k-merge vocabulary is
  * ~1 MB — broadcast with the closure, no join); per-partition word
  * memoization makes the cost ~one encode per DISTINCT word (Zipf's
  * law does the rest). No shuffle anywhere.
  */
object Bpe {

  /** Fixture training weights: the bench corpus vocabulary with its
    * measured frequencies, frozen as constants (training happens at
    * class-init on THIS table, never on runtime data — the merge list
    * must be a constant both engines share). */
  val FixtureWordFreq: Seq[(String, Long)] = Seq(
    "join" -> 964L, "hash" -> 947L, "row" -> 943L, "batch" -> 937L,
    "scan" -> 936L, "customer" -> 934L, "column" -> 934L, "filter" -> 933L,
    "small" -> 928L, "slow" -> 918L, "merge" -> 918L, "order" -> 912L,
    "vector" -> 912L, "line" -> 910L, "data" -> 908L, "table" -> 908L,
    "agg" -> 901L, "value" -> 897L, "key" -> 896L, "stream" -> 888L,
    "window" -> 886L, "spark" -> 880L, "a" -> 880L, "group" -> 878L,
    "part" -> 878L, "big" -> 876L, "sort" -> 872L, "query" -> 871L,
    "fast" -> 854L, "the" -> 840L, "dup" -> 26L)

  val FixtureNMerges = 32

  /** The fixture merge table, trained once at class-init (pure, fast:
    * 31 words × 32 rounds). */
  lazy val FixtureMerges: Seq[(String, String)] =
    train(FixtureWordFreq, FixtureNMerges)

  /** One leftmost-non-overlapping merge pass (the unit both engines
    * share: the SQL twin is a single `replace()`). */
  private def mergePass(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Classic BPE training over a word-frequency table: repeatedly merge
    * the highest-count adjacent symbol pair (ties: lexicographic on the
    * pair — deterministic across runs and engines). Stops early when no
    * pair remains (every word fused). */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0)
    var words: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b))
        words = words.map { case (syms, f) => (mergePass(syms, a, b), f) }
        k += 1
      }
    }
    merges.result()
  }

  /** Encode one pre-token: rank-ordered merge passes (see object doc
    * for why this equals the min-rank loop). */
  def encode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    val it = merges.iterator
    while (it.hasNext && syms.length > 1) {
      val (a, b) = it.next()
      syms = mergePass(syms, a, b)
    }
    syms
  }

  /** decode ∘ encode = id, by construction (merging only concatenates). */
  def decode(tokens: Seq[String]): String = tokens.mkString

  /** Per-partition memo bound: web-corpus distinct-word counts are
    * Zipf-bounded, but a hostile partition must not OOM the executor. */
  private val MemoCap = 1 << 20

  /** (id, n_tokens, n_bpe_tokens) per document: regex pre-tokenization
    * ([[TextStats.TokenRe]] — the same boundary both engines use), then
    * BPE token counts under `merges`. Map-side `mapPartitions` with a
    * per-partition distinct-word memo.
    *
    * Oracle restatability caveat: pre-tokens must not contain `U+0001`
    * (the SQL marker) — true for any text corpus; binary junk should be
    * filtered upstream. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)] = FixtureMerges): DataFrame = {
    val tokRe = TextStats.TokenRe.r
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, text) =>
          var nPre = 0L
          var nBpe = 0L
          val ms = tokRe.findAllIn(if (text == null) "" else text)
          while (ms.hasNext) {
            val w = ms.next()
            nPre += 1
            nBpe += (memo.get(w) match {
              case Some(n) => n
              case None =>
                val n = encode(w, merges).length
                if (memo.size < MemoCap) memo(w) = n
                n
            })
          }
          (id, nPre, nBpe)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong))
      .toDF(idCol, "n_tokens", "n_bpe_tokens")
  }

  /** DISTRIBUTED BPE training over the corpus itself — the missing half
    * of the tokenizer story ([[train]] runs driver-side over a frozen
    * table; real vocabularies are trained on the corpus). The house
    * fixed-point-loop shape ([[KMeans]]/[[PageRank]] discipline):
    *
    *  - the word-frequency VOCABULARY is built by one pre-token
    *    aggregate and stays distributed for the whole run (a 100 TB
    *    corpus has ~10^8 distinct pre-tokens — never collected);
    *  - each round is ONE shuffle (adjacent-pair counts weighted by
    *    word frequency, map-side partial) plus a 1-row bounded planning
    *    collect (the argmax pair under the deterministic
    *    (-count, a, b) order — same tie-break as [[train]]);
    *  - the merge rewrite is a pure map-side array fold
    *    ([[mergeFoldCol]] — provably the leftmost-non-overlapping pass:
    *    the folded symbol a+b can equal `a` only if `b` is empty, so a
    *    fresh merge can never immediately re-merge);
    *  - lineage is staged every few rounds (iterate-then-checkpoint).
    *
    * Determinism: identical to [[train]] — proven by the equivalence
    * spec and, end-to-end on the corpus, by the `llm_bpe_train` oracle
    * which replays every round in SQL (pair counts from the vocabulary,
    * argmax, one `replace()` rewrite — the [[sqlTokenCount]] marker
    * representation). */
  def trainDistributed(docs: DataFrame, idCol: String, textCol: String,
                       nMerges: Int, stageEvery: Int = 4): DataFrame = {
    require(nMerges >= 0 && stageEvery >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = docs
      .select(explode(TextStats.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        regexp_extract_all(col("w"), lit("."), lit(0)).as("syms"))
    // stage the vocabulary up front: the corpus is scanned exactly ONCE
    // for the whole training run — every round reads the (tiny,
    // Zipf-bounded) staged vocab, never the corpus
    var vocab = graft.util.Checkpoints.stage(vocab0)
    val merges = Vector.newBuilder[(Int, String, String)]
    var k = 1
    var exhausted = false
    while (k <= nMerges && !exhausted) {
      val pairs = vocab
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("a"),
                element_at(col("syms"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      // bounded planning collect: exactly the argmax row
      val best = pairs.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((k, a, b))
        val next = vocab.withColumn("syms", mergeFoldCol(col("syms"), a, b))
        vocab = if (k % stageEvery == 0 || k == nMerges)
          graft.util.Checkpoints.stage(next)
        else next
        k += 1
      }
    }
    // lhs/rhs, not left/right (SQL keywords in both engines)
    merges.result().toDF("rank", "lhs", "rhs")
      .select(col("rank").cast("long").as("rank"), col("lhs"), col("rhs"))
  }

  /** [[mergePass]] as a Catalyst fold (no UDF): leftmost-non-
    * overlapping because the freshly merged symbol `a+b` can equal the
    * pattern head `a` only for an empty `b` (see [[trainDistributed]]).
    *
    * Guarded by a cheap containment check: a word lacking symbol `a` or
    * symbol `b` cannot contain the adjacent pair, so the fold is the
    * identity on it — returning `syms` unchanged skips the per-element
    * fold for the (Zipf-dominant) majority of vocabulary rows each
    * round. Unstaged rounds stack these expressions, so the guard also
    * keeps the 1-3 carried rewrite layers from re-folding untouched
    * words (same output either way, asserted by the fold-vs-mergePass
    * equivalence spec). */
  private[ext] def mergeFoldCol(syms: org.apache.spark.sql.Column,
                                a: String, b: String)
      : org.apache.spark.sql.Column =
    when(array_contains(syms, a) && array_contains(syms, b),
      aggregate(syms, array().cast("array<string>"),
        (acc, s) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s)))))
      .otherwise(syms)

  /** The DuckDB twin of [[encode]]+count for one pre-token column
    * expression `tokExpr`: symbols rendered as `chr(1)||sym||' '`, one
    * `replace()` per merge in rank order, count = remaining markers.
    * Returns an expression yielding the BPE token count (BIGINT). */
  def sqlTokenCount(tokExpr: String,
                    merges: Seq[(String, String)] = FixtureMerges): String = {
    val seed = s"regexp_replace($tokExpr, '(.)', chr(1)||'\\1 ', 'g')"
    val chain = merges.foldLeft(seed) { case (acc, (a, b)) =>
      s"replace($acc, chr(1)||'$a '||chr(1)||'$b ', chr(1)||'$a$b ')"
    }
    s"CAST(len($chain) - len(replace($chain, chr(1), '')) AS BIGINT)"
  }
}
