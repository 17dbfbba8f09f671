package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
  * deduplication of an embedded corpus by k-means clustering, then
  * pruning near-identical pairs WITHIN each cluster — the insight being
  * that semantic duplicates land in the same cluster, so the candidate
  * set is the cell equi-join (cost Σ|cell|², bounded by occupancy),
  * never the corpus all-pairs. The paper removes all but one member of
  * each intra-cluster duplicate group; the keep rule here is
  * deterministic — a vector is PRUNED iff some SAME-CLUSTER vector with
  * a smaller id is within `tau` cosine — so retries, repartitions, and
  * the oracle all agree on the survivor set (the paper's
  * keep-one-random, made reproducible).
  *
  * Scale design (the 100 TB contract):
  *  - reuses the [[Ivf]] coarse quantizer: train on a sample, assign
  *    with the codegen'd nearest-cells kernel, and at scale WRITE the
  *    assignment bucketed by cell so the self-join is a co-located read;
  *  - the within-cell self-join carries (id, cell, vector) once on each
  *    side and shuffles on the cell key only — occupancy-bounded, and a
  *    degenerate hot cell is AQE-skew-splittable;
  *  - the prune decision is one aggregate over candidate pairs (any
  *    smaller-id neighbor ⇒ pruned), no iteration: unlike
  *    connected-components collapse, SemDeDup's survivor rule is local
  *    to a pair, which is what makes it run at web scale in one pass.
  *
  * Structural gate (`llm_semdedup_check`): pruned vectors are a SUBSET
  * of vectors having a smaller-id neighbor at `tau` ANYWHERE in the
  * corpus — both sides score with [[Similarity.pairSim]], so
  * `n_spurious_pruned = 0` holds by construction, and the live oracle
  * recomputes the superset while the deterministic pruned count is
  * pinned per scale factor. */
object SemDedup {

  /** Per-vector verdict: (idCol, cell, kept). */
  def prune(emb: DataFrame, idCol: String, vecCol: String,
            model: Ivf.Model, tau: Double): DataFrame = {
    val assigned = Ivf.assignCells(emb, vecCol, model)
      .select(col(idCol), col("cell"), col(vecCol).as("__v"),
        Similarity.l2(col(vecCol)).as("__n"))
    val a = assigned.select(col("cell"), col(idCol).as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    // smaller-id neighbors within the cell at >= tau: id_b is pruned
    val prunedIds = a.join(b, "cell")
      .where(col("id_a") < col("id_b"))
      .where(Similarity.pairSim(col("__va"), col("__na"),
        col("__vb"), col("__nb")) >= tau)
      .select(col("id_b").as(idCol)).distinct()
    assigned.select(col(idCol), col("cell"))
      .join(prunedIds.withColumn("__pruned", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(!col("__pruned"), lit(true)).as("kept"))
  }
}
