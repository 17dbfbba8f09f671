package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

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

  /** The sharded (id, shard, n_tokens) stream every document-boundary
    * packer consumes, hash-clustered so each shard's rows land wholly in
    * one partition and are visited in (shard, secondary) order. Shards
    * may share a partition (hash collisions) — packers reset state on
    * the shard change; production uses nShards ≫ cores so parallelism is
    * smooth regardless. */
  private def shardedStream(docsWithTokens: DataFrame, idCol: String,
                            nShards: Int, byTokensDesc: Boolean): DataFrame = {
    val base = docsWithTokens.select(
      col(idCol).cast("long").as("id"),
      pmod(Sampling.bucket(col(idCol)), lit(nShards)).as("shard"),
      col("n_tokens").cast("long").as("n_tokens"))
    val clustered = base.repartition(nShards, col("shard"))
    if (byTokensDesc)
      clustered.sortWithinPartitions(col("shard"),
        col("n_tokens").desc, col("id"))
    else
      clustered.sortWithinPartitions(col("shard"), col("id"))
  }

  /** Document-boundary packing, NEXT-FIT discipline: documents are
    * visited in (shard, id) order; a document that would overflow the
    * open pack closes it and opens a new one — no document is ever split
    * across sequences (the truncation-free layout of Ding et al. 2024,
    * "Fewer Truncations Improve Language Modeling"; next-fit is its
    * streaming single-open-bin form). An oversize document (n_tokens >
    * budget) occupies a pack alone — the only way a pack exceeds the
    * budget — and closes it immediately (any successor, even a
    * zero-token document, opens a new pack). Zero-token documents
    * otherwise join the open pack.
    *
    * The fold is genuinely sequential per shard (pack state depends on
    * every prior document), so this is the disclosed `mapPartitions`
    * case — O(1) state, one pass, nShards-way parallel, exactly the
    * concat-chunk layout's parallelism contract. Assignment is fully
    * deterministic: shard hash + per-shard id order fix the stream, the
    * fold is a pure function of it.
    *
    * Returns (idCol, shard, pack_id, n_tokens). */
  def nextFitCounts(docsWithTokens: DataFrame, idCol: String,
                    nShards: Int, budgetTokens: Long): DataFrame = {
    require(nShards >= 1 && budgetTokens >= 1, "need positive shards/budget")
    val ss = docsWithTokens.sparkSession
    import ss.implicits._
    val packed = shardedStream(docsWithTokens, idCol, nShards,
        byTokensDesc = false)
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var pack = 0L
        var fill = 0L
        it.map { case (id, sh, n) =>
          if (sh != curShard) { curShard = sh; pack = 0L; fill = n }
          else if (fill + n > budgetTokens) { pack += 1; fill = n }
          else fill += n
          (id, sh, pack, n)
        }
      }
    packed.toDF("id", "shard", "pack_id", "n_tokens")
      .withColumnRenamed("id", idCol)
  }

  /** Document-boundary packing, BEST-FIT-DECREASING discipline (Ding et
    * al. 2024's best-fit packing): documents are visited largest-first
    * per shard ((n_tokens DESC, id) order) and each is placed in the
    * open pack with the LEAST remaining capacity that still fits it —
    * ties to the lowest pack id — or opens a new pack. Never splits a
    * document; an oversize document packs alone (its pack is closed
    * immediately). BFD wastes no more space than next-fit and its pack
    * count carries the classic 11/9·OPT+O(1) bound.
    *
    * Per-shard state is the open-bin table keyed (remaining, pack_id) —
    * a balanced tree, O(log bins) per document; the fold is sequential
    * per shard by nature (same disclosed `mapPartitions` contract as
    * [[nextFitCounts]]). Fully deterministic: the visit order and the
    * tie-break are total orders.
    *
    * Returns (idCol, shard, pack_id, n_tokens); pack ids are in order of
    * OPENING within the shard. */
  def bestFitCounts(docsWithTokens: DataFrame, idCol: String,
                    nShards: Int, budgetTokens: Long): DataFrame = {
    require(nShards >= 1 && budgetTokens >= 1, "need positive shards/budget")
    val ss = docsWithTokens.sparkSession
    import ss.implicits._
    val packed = shardedStream(docsWithTokens, idCol, nShards,
        byTokensDesc = true)
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var nextPack = 0L
        // open bins keyed (remaining, pack_id): iteratorFrom((n, MinValue))
        // yields the tightest fit, ties to the lowest pack id
        val bins = mutable.TreeMap.empty[(Long, Long), Unit]
        it.map { case (id, sh, n) =>
          if (sh != curShard) { curShard = sh; nextPack = 0L; bins.clear() }
          val fitIt = bins.iteratorFrom((n, Long.MinValue))
          val pack =
            if (fitIt.hasNext) {
              val (rem, p) = fitIt.next()._1
              bins.remove((rem, p))
              if (rem - n > 0) bins.update((rem - n, p), ())
              p
            } else {
              val p = nextPack
              nextPack += 1
              val rem = budgetTokens - n
              if (rem > 0) bins.update((rem, p), ()) // oversize never reopens
              p
            }
          (id, sh, pack, n)
        }
      }
    packed.toDF("id", "shard", "pack_id", "n_tokens")
      .withColumnRenamed("id", idCol)
  }

  /** Per-pack rollup of [[nextFitCounts]] over [[TextStats.nTokens]]
    * counts — the fully-oracled greedy layout (the DuckDB twin replays
    * the fold as a recursive CTE). */
  def nextFitPacks(docs: DataFrame, idCol: String, textCol: String,
                   nShards: Int, budgetTokens: Long): DataFrame =
    rollup(nextFitCounts(
        docs.select(col(idCol),
          TextStats.nTokens(col(textCol)).cast("long").as("n_tokens")),
        idCol, nShards, budgetTokens), idCol)

  /** Per-pack rollup of [[bestFitCounts]] over [[TextStats.nTokens]]
    * counts (gated via the check row — BFD's bin table is not
    * SQL-restatable). */
  def bestFitPacks(docs: DataFrame, idCol: String, textCol: String,
                   nShards: Int, budgetTokens: Long): DataFrame =
    rollup(bestFitCounts(
        docs.select(col(idCol),
          TextStats.nTokens(col(textCol)).cast("long").as("n_tokens")),
        idCol, nShards, budgetTokens), idCol)
}
