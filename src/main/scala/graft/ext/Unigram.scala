package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** Unigram-LM tokenization (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model): each pre-token is segmented into
  * vocabulary PIECES by Viterbi, minimizing the total piece cost. The
  * second major tokenizer family next to [[Bpe]] (LLaMA-family
  * vocabularies are unigram models); the full algorithm learns costs
  * by EM — here the piece table is a frozen constant with INTEGER
  * costs (the same fixture discipline as [[Bpe.FixtureWordFreq]]), so
  * every quantity is cross-engine exact.
  *
  * Determinism (the cross-engine gate): the DP objective is the single
  * integer cost' = Σ over pieces of (1024·cost(piece) + 1). The
  * +1-per-piece epsilon folds the standard fewest-pieces tie-break
  * into the integer itself, so the MINIMUM is unambiguous even when
  * two segmentations share a raw cost, and the pair the caller wants
  * decodes exactly: n_pieces = cost' mod 1024, total raw cost =
  * cost' div 1024 (valid because a pre-token is required to have
  * < 1024 pieces — enforced fail-loud). Characters outside the piece
  * table advance as single-char `<unk>` pieces at [[UnkCost]] (the
  * SentencePiece fallback), so every input segments.
  *
  * Scale shape: encoding is pure map-side per-row work with a
  * per-partition distinct-word memo (the [[Bpe.tokenCounts]] shape);
  * the piece table ships with the closure (a real 32k-piece vocabulary
  * is well under 1 MB). No shuffle anywhere. The DuckDB oracle unrolls
  * the Viterbi DP by POSITION — level p's best cost is the min over
  * pieces ending at p of level (p − len) plus the piece cost, one
  * generated CTE per level — so `llm_unigram_tokens` is a fully live,
  * bit-identical row.
  */
object Unigram {

  /** The frozen fixture piece vocabulary: (piece, cost ≈ −log2 p in
    * whole bits). Single letters are the floor; common bigrams are
    * mid-priced; frequent whole words are cheap. Several corpus words
    * (customer, filter, vector, window, stream, dup) are deliberately
    * ABSENT so their segmentations exercise the subword and char
    * paths; digits are absent so numeric tokens exercise `<unk>`. */
  val FixturePieces: Seq[(String, Long)] = {
    val chars = ('a' to 'z').map(c => c.toString -> 13L)
    val subwords = Seq("er" -> 9L, "or" -> 9L, "in" -> 9L, "ow" -> 9L,
      "st" -> 9L, "re" -> 9L, "an" -> 9L, "ar" -> 9L, "le" -> 9L,
      "ve" -> 10L, "ct" -> 10L, "us" -> 10L, "om" -> 10L, "up" -> 10L,
      "il" -> 10L, "te" -> 10L, "am" -> 10L, "qu" -> 10L)
    val words = Seq("join", "hash", "row", "batch", "scan", "column",
      "small", "slow", "merge", "order", "line", "data", "table", "agg",
      "value", "key", "spark", "group", "part", "big", "sort", "query",
      "fast", "the").map(_ -> 20L)
    chars ++ subwords ++ words
  }

  /** `<unk>` single-character fallback cost (worse than any char
    * piece, so it is chosen only for uncovered characters). */
  val UnkCost = 40L

  /** The integer epsilon scale: one unit per piece rides below the
    * cost bits. Pre-tokens must have < Scale pieces (fail-loud). */
  val Scale = 1024L

  /** DP levels the registered ORACLE unrolls per word (SparkEntry's
    * unigram CTE chains are generated to exactly this depth): a
    * pre-token longer than this would silently drop from the oracle's
    * final union while the engine still counts it, surfacing only as
    * an opaque hash mismatch. Oracle-gated callers pass this as
    * [[trainDistributed]]'s `maxWordLen` so the divergence is
    * diagnosed fail-loud AT THE SOURCE instead. */
  val OracleDpLevels = 12

  private lazy val FixtureMap: Map[String, Long] = FixturePieces.toMap
  private lazy val MaxPieceLen: Int = FixturePieces.map(_._1.length).max

  /** cost' of the optimal segmentation of one pre-token (see object
    * doc for the encoding). O(len · maxPieceLen) per word. */
  def encodeCost(word: String,
                 pieces: Map[String, Long] = FixtureMap,
                 maxPieceLen: Int = -1): Long = {
    require(word.length < Scale,
      s"pre-token of ${word.length} chars exceeds the $Scale-piece bound")
    val maxLen = if (maxPieceLen > 0) maxPieceLen else MaxPieceLen
    val n = word.length
    val best = new Array[Long](n + 1)
    var p = 1
    while (p <= n) {
      var b = best(p - 1) + Scale * UnkCost + 1 // <unk> fallback
      var l = 1
      val lMax = math.min(p, maxLen)
      while (l <= lMax) {
        pieces.get(word.substring(p - l, p)) match {
          case Some(c) =>
            val cand = best(p - l) + Scale * c + 1
            if (cand < b) b = cand
          case None =>
        }
        l += 1
      }
      best(p) = b
      p += 1
    }
    best(n)
  }

  // ------------------------------------------------------------------
  // DISTRIBUTED Unigram-LM TRAINING (Kudo 2018 §3.2, engine-exact
  // variant) — the symmetric missing half of [[Bpe.trainDistributed]]:
  // the fixture vocabulary above is frozen; real vocabularies are
  // learned from the corpus. The reference algorithm is soft EM over
  // log-probabilities + likelihood-loss pruning; float forward-backward
  // cannot sit under a cross-engine hash gate, so this is the HARD
  // (Viterbi) EM with INTEGER bit-costs — the [[graft.ext.NaiveBayes]]
  // integer-bitlen discipline:
  //
  //  * seed: substring counts over the pre-token vocabulary (one
  //    aggregate + one TakeOrdered top-K); the alphabet (all length-1
  //    pieces) is always kept — SentencePiece's character coverage;
  //  * E-step: Viterbi-segment each DISTINCT vocab word under current
  //    costs (map-side, the cost table is a bounded plan-shipped
  //    model), count piece usages weighted by word frequency — ONE
  //    shuffle per round plus one bounded model collect;
  //  * M-step: cost(x) = bitlen(T) − bitlen(max(usage(x),1)) + 1 —
  //    a whole-bit −log2 estimate, exact in both engines
  //    (`length(bin(n))` is the DuckDB twin); unused multi-char
  //    pieces drop (hard EM's zero-count limit), unused alphabet
  //    chars keep the count-1 floor;
  //  * prune: the TRUE Kudo loss under hard EM — for every piece x
  //    used on a Viterbi path, loss(x) = Σ_w freq(w)·(cost'_{−x}(w) −
  //    cost'(w)) (the word re-segmented WITHOUT x), integer in cost'
  //    units so the piece-count epsilon breaks raw-bit ties; keep the
  //    top keepK by (loss DESC, piece ASC) plus the alphabet;
  //  * one post-prune refit round re-estimates costs on the survivor
  //    vocabulary (the standard EM-after-prune step).
  //
  // Training assumes alphabet coverage (every corpus char seeds a
  // length-1 piece), so the `<unk>` branch never wins on a training
  // path — enforced fail-loud in [[viterbiSeg]]; the DuckDB replay
  // drops such a word from the final union, failing the hash gate
  // equally loudly. The whole run is replayed round-for-round as
  // chained CTEs by the `llm_unigram_train` oracle (the
  // `llm_bpe_train` pattern: DP levels per position, the chosen piece
  // per (word, position) via the same shortest-last-piece tie-break,
  // backtrace as a recursive CTE).
  // ------------------------------------------------------------------

  /** bitlen(max(n,1)): 1 + floor(log2 n), the integer −log2 unit.
    * DuckDB twin: `length(bin(greatest(n, 1)))`. */
  def bitlen(n: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L))

  /** Viterbi with backtrace under an arbitrary cost table: returns
    * (cost', pieces). Candidate order at each position — `<unk>`
    * first, then piece lengths ascending with strict `<` — is the
    * [[encodeCost]] tie-break (shortest last piece wins equal cost'),
    * and the backtrace stores the winning candidate directly, so the
    * path is THE canonical optimum. `exclude` re-segments without one
    * piece (the prune loss). `onTrainingPath` forbids `<unk>` wins
    * (alphabet coverage is a training precondition). */
  def viterbiSeg(word: String, costs: Map[String, Long], maxPieceLen: Int,
                 exclude: String = null,
                 onTrainingPath: Boolean = true): (Long, List[String]) = {
    require(word.length < Scale,
      s"pre-token of ${word.length} chars exceeds the $Scale-piece bound")
    val n = word.length
    val best = new Array[Long](n + 1)
    val bestPiece = new Array[String](n + 1) // null = <unk> single char
    var p = 1
    while (p <= n) {
      var b = best(p - 1) + Scale * UnkCost + 1 // <unk> fallback
      var bp: String = null
      var l = 1
      val lMax = math.min(p, maxPieceLen)
      while (l <= lMax) {
        val cand = word.substring(p - l, p)
        if (cand != exclude) {
          costs.get(cand) match {
            case Some(c) =>
              val cc = best(p - l) + Scale * c + 1
              if (cc < b) { b = cc; bp = cand }
            case None =>
          }
        }
        l += 1
      }
      best(p) = b
      bestPiece(p) = bp
      p += 1
    }
    var pieces: List[String] = Nil
    var q = n
    while (q > 0) {
      val piece = bestPiece(q)
      require(piece != null || !onTrainingPath,
        s"unigram-train: <unk> on a training path at '$word':$q — " +
          "alphabet not covered")
      val step = if (piece == null) word.substring(q - 1, q) else piece
      pieces = step :: pieces
      q -= step.length
    }
    (best(n), pieces)
  }

  /** Training hyper-parameters (shared with the oracle generator).
    * Seed pieces up to 8 chars — long enough that whole frequent words
    * become candidate pieces (SentencePiece learns whole words; a
    * short cap would force every word subword-only). */
  val TrainSeedMaxLen = 8
  val TrainSeedTopK = 64
  val TrainEmRounds = 3
  val TrainKeepK = 24

  /** One M-step: cost(x) = bitlen(T) − bitlen(max(cnt,1)) + 1 over
    * alphabet ∪ used multi-char pieces. Public because the incremental
    * twin refits from monoid-merged usage slices. */
  def refit(usage: Map[String, Long],
            alphabet: Set[String]): Map[String, Long] = {
    val t = usage.valuesIterator.sum
    val tb = bitlen(t).toLong
    val multis = usage.collect {
      case (p, c) if p.length >= 2 && c >= 1 => p -> (tb - bitlen(c) + 1)
    }
    val chars = alphabet.iterator.map { ch =>
      ch -> (tb - bitlen(usage.getOrElse(ch, 1L)) + 1)
    }.toMap
    chars ++ multis
  }

  /** The distributed trainer — returns the learned (piece, cost)
    * table, ordered by piece. See the section comment for the
    * algorithm and scale shape; [[trainSequential]] is the pure-loop
    * reference the spec pins it against. */
  def trainDistributed(docs: DataFrame, idCol: String, textCol: String,
      seedMaxLen: Int = TrainSeedMaxLen, seedTopK: Int = TrainSeedTopK,
      emRounds: Int = TrainEmRounds, keepK: Int = TrainKeepK,
      maxWordLen: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    // the pre-token vocabulary: scanned from the corpus exactly once,
    // staged, and reused by every round (the Bpe.trainDistributed shape)
    val vocab = graft.util.Checkpoints.stage(
      docs.select(explode(TextStats.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq")))
      .as[(String, Long)]
    // Fail-loud pre-token length bound (mirrors the `< Scale pieces`
    // guard in viterbiSeg): an oracle-gated caller unrolls its DP to a
    // fixed depth ([[OracleDpLevels]]), and a longer word would drop
    // from the oracle while the engine counts it — an opaque hash
    // mismatch far from the cause. One bounded probe over the staged
    // vocabulary, only when a bound was asked for.
    if (maxWordLen != Int.MaxValue) {
      val bad = vocab.toDF("w", "freq").where(length(col("w")) > maxWordLen)
        .select("w").as[String].take(1)
      require(bad.isEmpty, s"unigram: pre-token '${bad.headOption.getOrElse("")}' " +
        s"of ${bad.headOption.map(_.length).getOrElse(0)} chars exceeds " +
        s"maxWordLen=$maxWordLen (the oracle DP unroll bound)")
    }

    // ---- seed: substring counts, one aggregate over the vocabulary
    val w = col("w")
    val seed = vocab.toDF("w", "freq")
      .select(col("freq"), explode(flatten(transform(
        sequence(lit(1), least(length(w), lit(seedMaxLen))),
        l => transform(sequence(lit(1), length(w) - l + 1),
          s => w.substr(s, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val alphabet = seed.where(length(col("piece")) === 1)
      .as[(String, Long)].collect().toMap // bounded: the alphabet
    val topMulti = seed.where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(seedTopK)
      .as[(String, Long)].collect() // bounded: seedTopK rows
    val seedCounts = alphabet ++ topMulti
    val t0 = bitlen(seedCounts.valuesIterator.sum).toLong
    var costs: Map[String, Long] =
      seedCounts.map { case (p, c) => p -> (t0 - bitlen(c) + 1) }

    // ---- E/M rounds: segment (map-side) → usage (one shuffle) →
    // bounded model collect → refit (driver, model-sized)
    def usageOf(cs: Map[String, Long]): Map[String, Long] =
      usageAgg(vocab.toDF("w", "freq"), cs)
        .as[(String, Long)].collect().toMap // bounded: ≤ model size
    for (_ <- 1 to emRounds) costs = refit(usageOf(costs), alphabet.keySet)

    // ---- prune by TRUE hard-EM loss: re-segment each word without
    // each multi-char piece on its Viterbi path (map-side; the number
    // of (word, used-piece) pairs is ≤ len/2 per word)
    val lMaxP = costs.keysIterator.map(_.length).max
    val costsP = costs
    val loss = vocab.flatMap { case (word, freq) =>
      val (full, pieces) = viterbiSeg(word, costsP, lMaxP)
      pieces.distinct.iterator.filter(_.length >= 2).map { x =>
        val alt = viterbiSeg(word, costsP, lMaxP, exclude = x)._1
        (x, freq * (alt - full))
      }
    }.toDF("piece", "d").groupBy("piece").agg(sum("d").as("loss"))
      .orderBy(col("loss").desc, col("piece")).limit(keepK)
      .as[(String, Long)].collect() // bounded: keepK rows
    val kept = alphabet.keySet ++ loss.iterator.map(_._1)
    costs = costs.view.filterKeys(kept).toMap

    // ---- post-prune refit (the standard EM-after-prune step)
    costs = refit(usageOf(costs), alphabet.keySet)

    costs.toSeq.sortBy(_._1).toDF("piece", "cost")
      .select(col("piece"), col("cost").cast("long").as("cost"))
  }

  /** Freq-weighted piece-usage aggregate of a (w, freq) vocabulary
    * under a fixed cost table — the E-step kernel: map-side Viterbi,
    * ONE shuffle. Stays a DataFrame so usage is a persistable,
    * monoid-mergeable slice (union + re-sum ≡ whole-corpus usage —
    * counts are a monoid, the NaiveBayes incremental discipline). */
  def usageAgg(vocabDf: DataFrame, costs: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    import vocabDf.sparkSession.implicits._
    val lMax = costs.keysIterator.map(_.length).max
    vocabDf.select(col("w"), col("freq").cast("long"))
      .as[(String, Long)]
      .flatMap { case (word, freq) =>
        viterbiSeg(word, costs, lMax)._2.map(p => (p, freq))
      }
      .toDF("piece", "f").groupBy("piece").agg(sum("f").as("cnt"))
  }

  /** Per-corpus-slice usage of raw documents under a fixed cost table
    * (pre-token vocab aggregate of the SLICE, then [[usageAgg]]). */
  def usageCounts(docs: DataFrame, idCol: String, textCol: String,
                  costs: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    usageAgg(docs
      .select(explode(TextStats.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq")), costs)
  }

  /** The sequential reference: identical arithmetic over an in-memory
    * (word, freq) table — the spec pins [[trainDistributed]] to it. */
  def trainSequential(wordFreq: Seq[(String, Long)],
      seedMaxLen: Int = TrainSeedMaxLen, seedTopK: Int = TrainSeedTopK,
      emRounds: Int = TrainEmRounds, keepK: Int = TrainKeepK)
      : Seq[(String, Long)] = {
    val seed = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wordFreq; l <- 1 to math.min(w.length, seedMaxLen);
         s <- 0 to w.length - l)
      seed(w.substring(s, s + l)) = seed.getOrElse(w.substring(s, s + l), 0L) + f
    val alphabet = seed.collect { case (p, c) if p.length == 1 => p -> c }.toMap
    val topMulti = seed.iterator.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedTopK)
    val seedCounts = alphabet ++ topMulti
    val t0 = bitlen(seedCounts.valuesIterator.sum).toLong
    var costs: Map[String, Long] =
      seedCounts.map { case (p, c) => p -> (t0 - bitlen(c) + 1) }
    def usageOf(cs: Map[String, Long]): Map[String, Long] = {
      val lMax = cs.keysIterator.map(_.length).max
      val u = scala.collection.mutable.Map.empty[String, Long]
      for ((word, f) <- wordFreq; p <- viterbiSeg(word, cs, lMax)._2)
        u(p) = u.getOrElse(p, 0L) + f
      u.toMap
    }
    for (_ <- 1 to emRounds) costs = refit(usageOf(costs), alphabet.keySet)
    val lMaxP = costs.keysIterator.map(_.length).max
    val loss = scala.collection.mutable.Map.empty[String, Long]
    for ((word, f) <- wordFreq) {
      val (full, pieces) = viterbiSeg(word, costs, lMaxP)
      for (x <- pieces.distinct if x.length >= 2) {
        val alt = viterbiSeg(word, costs, lMaxP, exclude = x)._1
        loss(x) = loss.getOrElse(x, 0L) + f * (alt - full)
      }
    }
    val kept = alphabet.keySet ++ loss.toSeq
      .sortBy { case (p, l) => (-l, p) }.take(keepK).map(_._1)
    costs = costs.view.filterKeys(kept).toMap
    costs = refit(usageOf(costs), alphabet.keySet)
    costs.toSeq.sortBy(_._1)
  }

  /** (id, n_tokens, n_pieces, total_cost) per document: regex
    * pre-tokenization ([[TextStats.TokenRe]] — the boundary both
    * engines share), then unigram Viterbi counts/costs. Map-side
    * `mapPartitions` with a per-partition distinct-word memo. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  pieces: Map[String, Long] = FixtureMap): DataFrame = {
    val tokRe = TextStats.TokenRe.r
    val maxLen =
      if (pieces eq FixtureMap) MaxPieceLen
      else pieces.keysIterator.map(_.length).max
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        val memoCap = 1 << 20
        it.map { case (id, text) =>
          var nPre = 0L
          var nPieces = 0L
          var cost = 0L
          val ms = tokRe.findAllIn(if (text == null) "" else text)
          while (ms.hasNext) {
            val w = ms.next()
            nPre += 1
            val cp = memo.get(w) match {
              case Some(c) => c
              case None =>
                val c = encodeCost(w, pieces, maxLen)
                if (memo.size < memoCap) memo(w) = c
                c
            }
            nPieces += cp % Scale
            cost += cp / Scale
          }
          (id, nPre, nPieces, cost)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "n_tokens", "n_pieces", "total_cost")
  }
}
