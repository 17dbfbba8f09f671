package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpecBase {

  private def vecDf(rows: (Long, Seq[Float])*) = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // three well-separated directions with near-identical members
  private val clustered = vecDf(
    1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0.99f, 0.01f, 0f, 0f),
    3L -> Seq(0.98f, 0.02f, 0f, 0f),
    10L -> Seq(0f, 1f, 0f, 0f), 11L -> Seq(0f, 0.99f, 0.01f, 0f),
    20L -> Seq(0f, 0f, 1f, 0f))

  test("near-identical cluster members prune to the min id") {
    val model = Ivf.train(clustered, "vec_id", "embedding", nCells = 3)
    val out = SemDedup.prune(clustered, "vec_id", "embedding", model,
      tau = 0.9).collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) === true,  "group survivor is the min id")
    assert(out(2L) === false && out(3L) === false)
    assert(out(20L) === true, "singleton clusters keep their member")
  }

  test("kept set is pairwise below tau within every cell (the SemDeDup invariant)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Ivf.train(real, "vec_id", "embedding", nCells = 16)
    val verdicts = SemDedup.prune(real, "vec_id", "embedding", model, 0.35)
    val kept = verdicts.where(col("kept"))
      .join(real, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"),
        Similarity.l2(col("embedding")).as("n2"))
    val a = kept.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("va"), col("n2").as("na"))
    val b = kept.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("n2").as("nb"))
    val offenders = a.join(b, "cell").where(col("id_a") < col("id_b"))
      .where(Similarity.pairSim(col("va"), col("na"), col("vb"), col("nb"))
        >= 0.35)
    assert(offenders.count() === 0L)
    assert(kept.count() < real.count(), "fixture must exercise pruning")
  }

  test("pruned is a structural subset of vectors with a smaller-id exact neighbor") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Ivf.train(real, "vec_id", "embedding", nCells = 16)
    val pruned = SemDedup.prune(real, "vec_id", "embedding", model, 0.35)
      .where(!col("kept")).select("vec_id")
    val catchable = Similarity.exactCosinePairs(real, "vec_id", "embedding",
      0.35).select(col("id_b").as("vec_id")).distinct()
    val spurious = pruned.join(catchable, Seq("vec_id"), "left_anti")
    assert(spurious.count() === 0L)
  }

  test("kept-set invariants hold under the scaled-k recipe (nCells = sqrt(n))") {
    // the llm_semdedup_scaledk ladder rung trains k = sqrt(n) cells;
    // both SemDeDup guarantees must be k-independent: no kept pair at
    // tau within a cell, and no spurious prune anywhere
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = real.count()
    val k = math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
    val model = Ivf.train(real, "vec_id", "embedding", nCells = k)
    val verdicts = SemDedup.prune(real, "vec_id", "embedding", model, 0.35)
    val kept = verdicts.where(col("kept"))
      .join(real, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"),
        Similarity.l2(col("embedding")).as("n2"))
    val a = kept.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("va"), col("n2").as("na"))
    val b = kept.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("n2").as("nb"))
    val offenders = a.join(b, "cell").where(col("id_a") < col("id_b"))
      .where(Similarity.pairSim(col("va"), col("na"), col("vb"), col("nb"))
        >= 0.35)
    assert(offenders.count() === 0L, s"kept pair above tau at k=$k")
    val pruned = verdicts.where(!col("kept")).select("vec_id")
    val catchable = Similarity.exactCosinePairs(real, "vec_id", "embedding",
      0.35).select(col("id_b").as("vec_id")).distinct()
    assert(pruned.join(catchable, Seq("vec_id"), "left_anti").count() === 0L,
      s"spurious prune at k=$k")
  }

  test("the within-cell join never plans a cartesian product") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Ivf.train(real, "vec_id", "embedding", nCells = 16)
    val p = SemDedup.prune(real, "vec_id", "embedding", model, 0.35)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"semdedup plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), "semdedup plans a nested loop")
  }
}
