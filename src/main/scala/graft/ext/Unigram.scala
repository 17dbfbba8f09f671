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

  private lazy val FixtureMap: Map[String, Long] = FixturePieces.toMap
  private lazy val MaxPieceLen: Int = FixturePieces.map(_._1.length).max

  /** cost' of the optimal segmentation of one pre-token (see object
    * doc for the encoding). O(len · maxPieceLen) per word. */
  def encodeCost(word: String,
                 pieces: Map[String, Long] = FixtureMap): Long = {
    require(word.length < Scale,
      s"pre-token of ${word.length} chars exceeds the $Scale-piece bound")
    val maxLen = MaxPieceLen
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

  /** (id, n_tokens, n_pieces, total_cost) per document: regex
    * pre-tokenization ([[TextStats.TokenRe]] — the boundary both
    * engines share), then unigram Viterbi counts/costs. Map-side
    * `mapPartitions` with a per-partition distinct-word memo. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokRe = TextStats.TokenRe.r
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
                val c = encodeCost(w)
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
