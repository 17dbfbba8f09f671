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

  /** Per-document pack assignment: (shard, pack_id, start_offset,
    * n_tokens). Token counts use [[TextStats.nTokens]] (the BPE-ish
    * regex, identically restatable in DuckDB). */
  def concatChunk(docs: DataFrame, idCol: String, textCol: String,
                  nShards: Int, budgetTokens: Long): DataFrame = {
    require(nShards >= 1 && budgetTokens >= 1, "need positive shards/budget")
    val tok = TextStats.nTokens(col(textCol)).cast("long")
    val w = Window.partitionBy("shard").orderBy(col(idCol).asc)
    docs
      .select(col(idCol),
        pmod(Sampling.bucket(col(idCol)), lit(nShards)).as("shard"),
        tok.as("n_tokens"))
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer division: both engines chunk identically (offsets >= 0)
      .withColumn("pack_id", expr(s"start_offset DIV $budgetTokens"))
  }

  /** Pack-level rollup: documents and tokens per pack. The pack token
    * count may exceed the budget only via its LAST document spilling
    * over the cut — concat-then-chunk's defining property. */
  def packs(docs: DataFrame, idCol: String, textCol: String,
            nShards: Int, budgetTokens: Long): DataFrame =
    concatChunk(docs, idCol, textCol, nShards, budgetTokens)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
}
