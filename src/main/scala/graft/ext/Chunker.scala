package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG / context-window prep
  * step that turns a long document into fixed-size overlapping pieces
  * (window `w`, stride `s`, overlap `w - s`). Two granularities:
  *
  *  - [[charChunks]]: codepoint windows. One arithmetic `sequence` of
  *    start offsets exploded per document, one `substr` per chunk.
  *  - [[tokenChunks]]: whitespace-token windows (the same
  *    [[TextStats.WsRun]] split the rest of the text family uses),
  *    chunk text rejoined with single spaces so the chunk bytes are
  *    identical in both engines regardless of the source whitespace.
  *
  * Both are PURE per-row projections — an explode of an arithmetic
  * sequence followed by map-side slicing. No shuffle, no state, no
  * UDFs; everything stays inside whole-stage codegen. 100 TB design:
  * chunk fan-out per doc is ceil(len/stride) (bounded by the corpus's
  * own length cap), the explode happens after column pruning so the
  * scan reads only (id, text), and downstream per-chunk work
  * (embedding, dedup, indexing) inherits the corpus partitioning —
  * chunking itself never becomes a shuffle boundary.
  *
  * Reference scope: the reference (glue/cdc_hudi.py, 287 LoC) has no
  * text operators; this extends the SURVEY §2.8 LLM-pipeline surface.
  */
object Chunker {

  /** Integer chunk ordinal from a 1-based start offset: (start-1)/stride.
    * `floor` over a double is exact here (offsets < 2^53). */
  private def chunkId(start: Column, stride: Int): Column =
    floor((start - 1) / stride).cast("long")

  /** Codepoint sliding windows. Documents with `length(text) = 0` are
    * skipped (no chunk rows — the oracle applies the same predicate).
    *
    * Output: (id, chunk_id, start_pos, chunk, n_chunk_chars), one row
    * per window; `start_pos` is 1-based (SQL `substr` convention),
    * the final window of a document may be shorter than `window`.
    */
  def charChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val len = length(col(textCol))
    df.where(len > 0)
      .select(col(idCol), col(textCol).as("__text"),
        explode(sequence(lit(1), len, lit(stride))).as("start_pos"))
      .select(
        col(idCol),
        chunkId(col("start_pos"), stride).as("chunk_id"),
        col("start_pos").cast("long").as("start_pos"),
        col("__text").substr(col("start_pos"), lit(window)).as("chunk"),
        least(lit(window), length(col("__text")) - col("start_pos") + 1)
          .cast("long").as("n_chunk_chars"))
  }

  /** Whitespace-token sliding windows. Tokens come from
    * [[TextStats.words]] (the RE2-exact `[\t\n\f\r ]+` run split) with
    * empty tokens dropped — SQL `trim` strips only spaces, so a
    * tab-padded document would otherwise yield phantom empty tokens in
    * BOTH engines; the explicit filter makes "token" mean a non-empty
    * run in every whitespace regime. Documents with zero tokens are
    * skipped (same predicate in the oracle). Each chunk is `window`
    * consecutive tokens starting every `stride` tokens, rejoined with
    * a single space.
    *
    * Output: (id, chunk_id, start_token, chunk, n_chunk_tokens);
    * `start_token` is 1-based.
    */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    df.select(col(idCol),
        filter(TextStats.words(col(textCol)), t => t =!= "").as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")), lit(stride)))
          .as("start_token"))
      .select(
        col(idCol),
        chunkId(col("start_token"), stride).as("chunk_id"),
        col("start_token").cast("long").as("start_token"),
        array_join(slice(col("__toks"), col("start_token"), lit(window)), " ")
          .as("chunk"),
        least(lit(window), size(col("__toks")) - col("start_token") + 1)
          .cast("long").as("n_chunk_tokens"))
  }

  /** Per-document roll-up over a chunk table produced by either
    * variant: chunk count, unit total (chars or tokens — pass the
    * matching column), and the short-tail length of the final chunk.
    * One hash aggregation on the id — the only shuffle in the family.
    */
  def stats(chunks: DataFrame, idCol: String, unitCol: String): DataFrame =
    chunks.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col(unitCol)).as("sum_units"),
        min(col(unitCol)).as("min_units"),
        max(col(unitCol)).as("max_units"))
}
