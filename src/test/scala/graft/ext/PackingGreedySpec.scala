package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PackingGreedySpec extends SparkSpecBase {
  import spark.implicits._

  private def counts(rows: (Long, Long)*): DataFrame =
    rows.toDF("doc_id", "n_tokens")

  private def assign(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select("doc_id", "shard", "pack_id").orderBy("doc_id")
      .as[(Long, Long, Long)].collect.toSeq

  test("nextFit: budget cut opens a new pack; doc never splits") {
    // one shard: visit order is doc_id
    val d = counts(1L -> 4L, 2L -> 3L, 3L -> 5L, 4L -> 2L)
    val got = assign(Packing.nextFitCounts(d, "doc_id", 1, budgetTokens = 10L))
    // 4+3=7, +5 would hit 12 > 10 → doc 3 opens pack 1; 5+2=7 fits
    assert(got === Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 1L), (4L, 0L, 1L)))
  }

  test("nextFit: oversize doc packs alone; zero-token docs join the open pack") {
    val d = counts(1L -> 2L, 2L -> 50L, 3L -> 0L, 4L -> 3L)
    val got = assign(Packing.nextFitCounts(d, "doc_id", 1, budgetTokens = 10L))
    // doc2 (50 > 10) forces pack 1 and fills it past budget, so the NEXT
    // doc — even the 0-token doc3 (fill + 0 > budget) — opens pack 2:
    // oversize packs close immediately; doc4 joins the fresh pack
    assert(got === Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 2L), (4L, 0L, 2L)))
  }

  test("nextFit: deterministic under repartition; shards are independent") {
    val d = (1L to 400L).map(i => (i, (i % 13) + 1)).toDF("doc_id", "n_tokens")
    val a = assign(Packing.nextFitCounts(d, "doc_id", 8, 64L))
    val b = assign(Packing.nextFitCounts(d.repartition(17), "doc_id", 8, 64L))
    assert(a === b, "assignment must not depend on input partitioning")
    // shard key matches the concat-chunk layout's scramble
    val shards = Packing.nextFitCounts(d, "doc_id", 8, 64L)
      .select("shard").distinct().as[Long].collect.toSet
    assert(shards.subsetOf((0L until 8L).toSet) && shards.size > 1)
  }

  test("bestFit: tightest-fit placement beats next-fit on the classic fixture") {
    // BFD visits 6,5,4,3 (desc): 6→p0, 5→p1, 4→p1(rem 5? no: rem=4→fits
    // tightest p1 rem 4? budget 9: p0 rem 3, p1 rem 4 → 4 fits p1), 3→p0
    val d = counts(1L -> 6L, 2L -> 5L, 3L -> 4L, 4L -> 3L)
    val bfd = assign(Packing.bestFitCounts(d, "doc_id", 1, budgetTokens = 9L))
    assert(bfd === Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 1L), (4L, 0L, 0L)))
    val nBfd = bfd.map(_._3).distinct.size
    val nNf = assign(Packing.nextFitCounts(d, "doc_id", 1, 9L))
      .map(_._3).distinct.size
    assert(nBfd === 2 && nNf === 3, "BFD must pack 2 bins where next-fit needs 3")
  }

  test("bestFit: ties break to the lowest pack id; exact fill closes the bin") {
    // budget 10: docs 5,5,5,5 → BFD: p0(5), tightest fit p0 → p0 full
    // (rem 0 → closed), p1(5), p1 full; 2 packs, exact fills
    val d = counts(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L)
    val got = assign(Packing.bestFitCounts(d, "doc_id", 1, budgetTokens = 10L))
    assert(got === Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 1L), (4L, 0L, 1L)))
  }

  test("bestFit: oversize doc packs alone and never reopens") {
    val d = counts(1L -> 50L, 2L -> 4L, 3L -> 3L)
    val got = assign(Packing.bestFitCounts(d, "doc_id", 1, budgetTokens = 10L))
    // visit 50, 4, 3: 50 → p0 (oversize, closed); 4 → p1; 3 → p1 (rem 6)
    assert(got === Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 1L)))
  }

  test("bestFit: invariants on a generated corpus — partition exact, " +
    "multi-doc packs within budget, count between LB and next-fit") {
    val budget = 64L
    val d = (1L to 500L).map(i => (i, (i * 7L) % 90L)).toDF("doc_id", "n_tokens")
    val bfd = Packing.bestFitCounts(d, "doc_id", 8, budget)
    assert(bfd.count() === 500L)
    assert(bfd.select(sum("n_tokens")).as[Long].head ===
      (1L to 500L).map(i => (i * 7L) % 90L).sum)
    val packs = bfd.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("nd"), sum("n_tokens").as("pt"))
    assert(packs.where(col("pt") > budget && col("nd") > 1).count() === 0L,
      "only single-doc (oversize) packs may exceed the budget")
    val nBfd = packs.count()
    val nNf = Packing.nextFitCounts(d, "doc_id", 8, budget)
      .select("shard", "pack_id").distinct().count()
    assert(nBfd <= nNf, s"BFD used $nBfd packs, next-fit $nNf")
    // oversize docs pack alone ABOVE budget, so the valid bound is
    // n_oversize + ceil(rest / budget) per shard, not ceil(total/budget)
    val lb = d.select(pmod(Sampling.bucket(col("doc_id")), lit(8)).as("shard"),
        col("n_tokens"))
      .groupBy("shard").agg(
        sum(when(col("n_tokens") > budget, 1L).otherwise(0L)).as("n_over"),
        sum(when(col("n_tokens") > budget, 0L).otherwise(col("n_tokens")))
          .as("t_rest"))
      .select(sum(col("n_over") + expr(s"(t_rest + ${budget - 1}) DIV $budget")))
      .as[Long].head
    assert(nBfd >= lb, s"BFD used $nBfd packs, lower bound $lb")
    // determinism under repartition (bin-table path)
    val a = assign(bfd)
    val b = assign(Packing.bestFitCounts(d.repartition(23), "doc_id", 8, budget))
    assert(a === b)
  }

  test("check row: all gates true on the sf0.001 corpus") {
    val row = graft.queries.LlmQueries
      .packBestfitCheck(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getAs[Boolean]("partition_exact"))
    assert(row.getAs[Boolean]("within_budget_ok"))
    assert(row.getAs[Boolean]("le_nextfit_ok"))
    assert(row.getAs[Boolean]("ge_lowerbound_ok"))
    assert(row.getAs[Long]("n_docs") === 500L)
  }
}

/** The cross-tokenizer reconciliation row: every layout packs every
  * document exactly once, so n_docs agrees across the four arms. */
class PackReconcileSpec extends SparkSpecBase {
  import spark.implicits._

  test("four packing twins agree on doc counts, differ in budgets") {
    val rows = graft.queries.LlmQueries
      .packReconcile(spark, "/root/testdata/sf0.001")
      .select("tokenizer", "n_docs", "sum_tokens")
      .as[(String, Long, Long)].collect()
    assert(rows.length === 4)
    assert(rows.map(_._2).distinct.length === 1, "n_docs must agree")
    // budgets genuinely diverge (two arms may coincide on a corpus
    // where every word is in both vocabularies — that's fine)
    assert(rows.map(_._3).distinct.length >= 2,
      "token budgets should differ across tokenizers on this corpus")
  }
}
