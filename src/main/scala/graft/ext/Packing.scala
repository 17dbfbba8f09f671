package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents to fixed-token-budget
  * packs with concat-then-chunk semantics — documents are laid out
  * end-to-end in a deterministic order and the stream is cut every
  * `budgetTokens`; a document belongs to the pack its first token lands
  * in. This is the standard pretraining data layout (documents
  * concatenated, chunked into constant-length sequences).
  *
  * Scale shape: a GLOBAL concatenation order would be a single-partition
  * window — the classic scale-killer — so the layout is sharded first by
  * the engine-portable key scramble ([[Sampling.bucket]]): each shard is
  * an independent concatenation stream, giving `nShards`-way parallelism
  * while keeping the assignment fully deterministic (same docs → same
  * packs, any cluster size, any engine). One shuffle on shard; the
  * running sum and the chunk division are window + map work on top.
  */
object Packing {

  /** Pack assignment for documents that already carry a token count in
    * `n_tokens` — the core all tokenizers share: any counting scheme
    * (regex, BPE via [[Bpe.tokenCounts]], a served tokenizer) plugs in
    * by supplying the column. */
  def concatChunkCounts(docsWithTokens: DataFrame, idCol: String,
                        nShards: Int, budgetTokens: Long): DataFrame = {
    require(nShards >= 1 && budgetTokens >= 1, "need positive shards/budget")
    val w = Window.partitionBy("shard").orderBy(col(idCol).asc)
    docsWithTokens
      .select(col(idCol),
        pmod(Sampling.bucket(col(idCol)), lit(nShards)).as("shard"),
        col("n_tokens").cast("long").as("n_tokens"))
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer division: both engines chunk identically (offsets >= 0)
      .withColumn("pack_id", expr(s"start_offset DIV $budgetTokens"))
  }

  /** Per-document pack assignment: (shard, pack_id, start_offset,
    * n_tokens). Token counts use [[TextStats.nTokens]] (the BPE-ish
    * regex, identically restatable in DuckDB). */
  def concatChunk(docs: DataFrame, idCol: String, textCol: String,
                  nShards: Int, budgetTokens: Long): DataFrame =
    concatChunkCounts(
      docs.select(col(idCol),
        TextStats.nTokens(col(textCol)).cast("long").as("n_tokens")),
      idCol, nShards, budgetTokens)

  private def rollup(assigned: DataFrame, idCol: String): DataFrame =
    assigned.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Pack-level rollup: documents and tokens per pack. The pack token
    * count may exceed the budget only via its LAST document spilling
    * over the cut — concat-then-chunk's defining property. */
  def packs(docs: DataFrame, idCol: String, textCol: String,
            nShards: Int, budgetTokens: Long): DataFrame =
    rollup(concatChunk(docs, idCol, textCol, nShards, budgetTokens), idCol)

  /** [[packs]] over a precomputed `n_tokens` column (token-exact
    * packing under a real tokenizer — see [[Bpe]]). */
  def packsCounts(docsWithTokens: DataFrame, idCol: String,
                  nShards: Int, budgetTokens: Long): DataFrame =
    rollup(concatChunkCounts(docsWithTokens, idCol, nShards, budgetTokens),
      idCol)
}
