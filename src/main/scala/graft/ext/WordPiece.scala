package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Wu et al. 2016; the BERT tokenizer) —
  * greedy longest-match-first segmentation against a fixed vocabulary,
  * with position-aware pieces: a piece may be valid word-INITIALLY,
  * as a CONTINUATION (BERT's `##` pieces), or both, and a word any of
  * whose characters cannot be matched collapses to a single `[UNK]`
  * token. Completes the production tokenizer triad next to [[Bpe]]
  * (merge-rank replay) and [[Unigram]] (Viterbi): the three families
  * real pipelines budget tokens with.
  *
  * Fixture vocabulary (the [[Bpe.FixtureWordFreq]] discipline —
  * constants both engines share, never trained on runtime data): the
  * corpus charset as single-char pieces plus every symbol
  * [[Bpe.FixtureMerges]] produces, each admitted in BOTH start and
  * continuation position. Real vocabularies are asymmetric; the
  * position flag is still exercised end-to-end because matching
  * CONSULTS it at every step (WordPieceSpec proves asymmetric
  * vocabularies change the segmentation).
  *
  * Scale shape (the [[Bpe.tokenCounts]] contract): encoding is pure
  * map-side per-row work, the vocabulary is a plan-shipped constant
  * (a real 30k-piece vocab is well under a MB), per-partition word
  * memoization makes the cost ~one encode per DISTINCT word. No
  * shuffle anywhere. The DuckDB oracle replays greedy longest-match
  * exactly as a recursive CTE (position chain with a
  * longest-match-wins NOT EXISTS guard) over the same interpolated
  * piece table — `llm_wordpiece_tokens` is hash-exact, not pinned.
  */
object WordPiece {

  /** Start-position fixture pieces: corpus charset + BPE-merge symbols. */
  lazy val FixtureStart: Seq[String] = fixturePieces
  /** Continuation fixture pieces (symmetric by construction — see
    * object doc; asymmetry is spec-covered via the parameterized
    * encode). */
  lazy val FixtureCont: Seq[String] = fixturePieces

  private lazy val fixturePieces: Seq[String] = {
    val chars = Bpe.FixtureWordFreq.map(_._1).flatMap(_.map(_.toString))
    val merged = Bpe.FixtureMerges.map { case (a, b) => a + b }
    (chars ++ merged).distinct.sorted
  }

  /** Greedy longest-match token count for one word: longest allowed
    * piece at each position (allowed set switches on position 0 vs
    * later — the `##` semantics), `[UNK]` (count 1) when no piece
    * matches. Deterministic: distinct pieces can tie only in length,
    * and the longest is unique per (content, position). */
  def encodeCount(word: String, start: Set[String], cont: Set[String],
                  maxPieceLen: Int): Long = {
    var pos = 0
    var n = 0L
    while (pos < word.length) {
      val allowed = if (pos == 0) start else cont
      var len = math.min(maxPieceLen, word.length - pos)
      var found = 0
      while (len >= 1 && found == 0) {
        if (allowed.contains(word.substring(pos, pos + len))) found = len
        else len -= 1
      }
      if (found == 0) return 1L // BERT rule: any dead end → whole word [UNK]
      pos += found
      n += 1
    }
    n
  }

  /** (id, n_tokens, n_wp_tokens) per document: [[TextStats.TokenRe]]
    * pre-tokenization (the boundary every tokenizer row shares), then
    * greedy WordPiece counts — map-side with a per-partition
    * distinct-word memo. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  start: Seq[String] = FixtureStart,
                  cont: Seq[String] = FixtureCont): DataFrame = {
    val tokRe = TextStats.TokenRe.r
    val startSet = start.toSet
    val contSet = cont.toSet
    val maxLen = (startSet.iterator ++ contSet.iterator)
      .map(_.length).foldLeft(1)(math.max)
    val memoCap = 1 << 20
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, text) =>
          var nPre = 0L
          var nWp = 0L
          val ms = tokRe.findAllIn(if (text == null) "" else text)
          while (ms.hasNext) {
            val w = ms.next()
            nPre += 1
            nWp += (memo.get(w) match {
              case Some(n) => n
              case None =>
                val n = encodeCount(w, startSet, contSet, maxLen)
                if (memo.size < memoCap) memo(w) = n
                n
            })
          }
          (id, nPre, nWp)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong))
      .toDF(idCol, "n_tokens", "n_wp_tokens")
  }

  /** The fixture piece table as a SQL VALUES list
    * `(piece, len, cont)` — one row per (piece, position-class),
    * interpolated into the oracle so both engines match against the
    * identical vocabulary. */
  def sqlPiecesValues: String = {
    def rows(ps: Seq[String], contFlag: Boolean) = ps.map { p =>
      val esc = p.replace("'", "''")
      s"('$esc',${p.length},$contFlag)"
    }
    (rows(FixtureStart, contFlag = false) ++
      rows(FixtureCont, contFlag = true)).mkString(",\n   ")
  }
}
