package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over embedding columns in FIXED-POINT
  * integer arithmetic — the clustering primitive behind corpus
  * bucketing, SemDeDup-style cell assignment, and coreset selection.
  * Extension beyond the reference (SURVEY.md §2.8 north star), sibling
  * of [[Ivf]] (whose coarse quantizer trains driver-side over a sample;
  * this one runs every Lloyd step over the FULL corpus, and its
  * integer arithmetic makes the whole iteration oracle-gateable).
  *
  * Why fixed-point (the [[PageRank]] discipline): float k-means sums
  * coordinates in shuffle order, so two runs disagree in the low bits
  * and assignments near a Voronoi boundary flip — the result cannot be
  * hash-gated. Here every coordinate is quantized once to
  * `floor(x * scale)` micro-units (exact: FLOAT widens to DOUBLE
  * losslessly, the multiply is IEEE-identical everywhere, floor is
  * exact), distances are BIGINT sums of squared differences
  * (order-independent), the argmin tie-breaks on the smallest cell id,
  * and centroid means are `floor(sum / count)` computed in DOUBLE —
  * exact because the quotient's distance to any integer is at least
  * 1/count, orders of magnitude above the ~1e-10 ulp at these
  * magnitudes (sums stay far under 2^53), so both engines floor the
  * same value.
  *
  * Scale shape (the 100 TB contract): the assignment step is PURE
  * MAP-SIDE — centroids ride into the plan as literals (k·dim longs,
  * the [[Ivf]] pattern; no join, no shuffle), distances evaluate
  * inside codegen'd zip_with/aggregate HOFs. The update step is ONE
  * shuffle of (cell, dim, partial-sum) with map-side combine; the
  * driver holds k·dim longs between rounds — the textbook distributed
  * Lloyd layout. Iterations are FIXED (a convergence knob independent
  * of n); empty cells inherit their previous centroid. Initialization
  * is the k smallest ids' vectors — deterministic and
  * oracle-restatable; production runs over 100 TB would seed from a
  * sampled k-means++ pass instead (disclosed — initialization quality,
  * not mechanics, is what changes). */
object KMeans {

  final case class Model(centroids: Array[Array[Long]]) {
    def k: Int = centroids.length
  }

  /** (id, qv: array<bigint>) — coordinates in `scale` micro-units. */
  def quantize(vecs: DataFrame, idCol: String, vecCol: String,
               scale: Double = 1000000.0): DataFrame =
    vecs.select(col(idCol),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale)).cast("long")).as("qv"))

  /** Squared L2 distance between the quantized column and one literal
    * centroid — a BIGINT expression, no shuffle. */
  private def dist2(qv: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(qv, typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Map-side assignment against literal centroids: (id, cell) with
    * argmin tie-break to the SMALLEST cell index (array_position finds
    * the first minimum). */
  def assign(q: DataFrame, idCol: String, model: Model): DataFrame = {
    val dists = array(model.centroids.map(c => dist2(col("qv"), c)): _*)
    q.select(col(idCol),
      (array_position(dists, array_min(dists)) - 1).cast("long").as("cell"))
  }

  /** `iters` synchronous Lloyd rounds over the full corpus; returns the
    * trained model and the FINAL assignment (one extra map-side pass
    * under the last centroids). */
  def train(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int, scale: Double = 1000000.0): (Model, DataFrame) = {
    require(k >= 1 && iters >= 1)
    val q = quantize(vecs, idCol, vecCol, scale)
    // Deterministic init: the k smallest ids' vectors (bounded planning
    // collect — k rows, the Ivf centroid-collect pattern).
    var cents: Array[Array[Long]] = q.orderBy(col(idCol)).limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("qv").toArray)
    require(cents.length == k, s"corpus smaller than k=$k")
    runLloyd(q, idCol, iters, cents)
  }

  private def runLloyd(q: DataFrame, idCol: String, iters: Int,
                       init: Array[Array[Long]]): (Model, DataFrame) = {
    var cents = init
    for (_ <- 1 to iters) {
      // One shuffle: (cell, dim) integer partial sums + counts.
      val sums = assign(q, idCol, Model(cents))
        .join(q, idCol)
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
        .select(col("cell"), col("pos"),
          floor(col("sv").cast("double") / col("cnt").cast("double"))
            .cast("long").as("m"))
        .collect() // bounded: k·dim rows of planning state
      val next = cents.map(_.clone())
      sums.foreach { r =>
        next(r.getAs[Long]("cell").toInt)(r.getAs[Int]("pos")) =
          r.getAs[Long]("m")
      }
      cents = next // cells with no members kept their previous centroid
    }
    (Model(cents), assign(q, idCol, Model(cents)))
  }

  // -------------------------------------------------- model persistence

  /** Persist a trained model as a (cell, qv) parquet table — the
    * artifact the incremental/streaming assign paths load, so nightly
    * re-trains and streaming assignment share one stored quantizer
    * (the [[Ivf]] model/ layout discipline). All IO through the
    * session's Hadoop FS via the DataFrame writer. */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                 path: String): Unit = {
    val s = spark; import s.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("cell", "qv")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    val rows = spark.read.parquet(path).orderBy("cell").collect()
    Model(rows.map(_.getAs[scala.collection.Seq[Long]]("qv").toArray))
  }
}
