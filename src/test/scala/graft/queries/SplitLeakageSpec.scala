package graft.queries

import graft.SparkSpecBase
import graft.ext.Sampling

import org.apache.spark.sql.functions._

/** Split-leakage audit invariants on the sf0.001 fixture: every
  * reported pair genuinely crosses the deterministic split with the
  * sides correctly labeled, and the rollup reconciles with the raw
  * corpus and the pair set. */
class SplitLeakageSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("every leak pair crosses the split, sides labeled correctly") {
    val rows = LlmQueries.splitLeakage(spark, dir).collect()
    assert(rows.nonEmpty, "fixture must produce cross-split near-dups")
    def isVal(id: Long): Boolean =
      Math.floorMod(Math.floorMod(id * Sampling.Multiplier, Sampling.Prime),
        Sampling.Million) < LlmQueries.ValPpm
    rows.foreach { r =>
      val (v, t, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(isVal(v), s"val_doc $v must hash into the val split")
      assert(!isVal(t), s"train_doc $t must hash into the train split")
      assert(j >= 0.5, s"pair ($v,$t) below the near-dup threshold: $j")
    }
  }

  test("rollup reconciles with the corpus and the pair set") {
    val stats = LlmQueries.splitStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(stats("val")._1 + stats("train")._1 === total)
    val lk = LlmQueries.splitLeakage(spark, dir)
    assert(stats("val")._2 ===
      lk.select("val_doc").distinct().count())
    assert(stats("train")._2 ===
      lk.select("train_doc").distinct().count())
    // a 10% split must actually be minority-sized on the fixture
    assert(stats("val")._1 < stats("train")._1)
  }

  test("component-keyed split is leak-free where the naive split leaks") {
    // the naive per-doc split demonstrably leaks on this fixture…
    assert(LlmQueries.splitLeakage(spark, dir).count() > 0)
    // …the component-keyed split cannot: zero crossing pairs, proven
    // by the same live pair set
    val stats = LlmQueries.splitSafeStats(spark, dir).collect()(0)
    assert(stats.getAs[Long]("leak_pairs") === 0L)
    // still covers the whole corpus with a minority val side
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(stats.getAs[Long]("n_train") + stats.getAs[Long]("n_val") === total)
    assert(stats.getAs[Long]("n_val") > 0 &&
      stats.getAs[Long]("n_val") < stats.getAs[Long]("n_train"))
    // and every near-dup cluster lands wholly on one side
    val sp = LlmQueries.splitSafe(spark, dir)
    val cc = graft.ext.Dedup.connectedComponents(
        graft.ext.Dedup.jaccardPairs(
          spark.read.parquet(s"$dir/documents.parquet"),
          "doc_id", "text", n = 3, threshold = 0.5,
          maxDf = LlmQueries.JaccardMaxDf))
      .withColumnRenamed("id", "doc_id")
    val splitPerComp = sp.join(cc, "doc_id")
      .groupBy("comp").agg(count_distinct(col("split")).as("n_sides"))
      .collect()
    assert(splitPerComp.nonEmpty &&
      splitPerComp.forall(_.getAs[Long]("n_sides") === 1L))
  }
}
