package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via grid bucketing — the second
  * non-equi join family Spark has no native form of (SURVEY.md §2.5;
  * the first is [[AsOfJoin]]). A naive
  * `points JOIN intervals ON keys AND lo <= p AND p <= hi` carries a
  * non-equi predicate, so Spark plans a per-key nested loop — quadratic
  * in rows per key. The grid form restores an EQUI-join:
  *
  *  - intervals explode into the fixed-width buckets they span (cost
  *    `(hi-lo)/bucketWidth + 1` rows per interval — pick `bucketWidth`
  *    near the typical interval span so this is a small constant);
  *  - a point lives in exactly ONE bucket, so the equi-join on
  *    (keys, bucket) + the exact containment filter finds every
  *    qualifying pair EXACTLY once — no post-join dedup shuffle;
  *  - the join is a plain shuffled (or broadcast) hash join: AQE can
  *    split skewed buckets, partial aggregation applies downstream, and
  *    nothing is quadratic except true result pairs.
  *
  * Domain is numeric (epoch days, epoch seconds, positions — caller
  * converts); both bounds are INCLUSIVE, matching SQL `BETWEEN` and the
  * DuckDB oracle. Intervals with `hi < lo` match nothing (same as
  * BETWEEN). Negative domains work: bucketing floor-divides.
  */
object IntervalJoin {

  /** All (point row, interval row) pairs with
    * `lo <= point <= hi` and pairwise-equal keys. Output columns =
    * point columns ++ interval columns minus the interval keys (the
    * paired point keys carry the value). Column names of the two inputs
    * must not collide except on paired keys. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKeys: Seq[String], intervalKeys: Seq[String],
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(pointKeys.size == intervalKeys.size,
      "need positionally-paired key lists")
    val clash = (points.columns.toSet & intervals.columns.toSet) --
      pointKeys.zip(intervalKeys).collect { case (p, i) if p == i => p }
    require(clash.isEmpty, s"column name collision: $clash")
    // internal names: "__b" would be silently overwritten by the bucket
    // column (and re-emitted as bucket values in the output); "__pt"/"__iv"
    // would capture the dataset aliases. Reject up front, like AsOfJoin.
    val reserved = Set("__b", "__pt", "__iv")
    val takenInternal =
      (points.columns.toSet ++ intervals.columns.toSet) & reserved
    require(takenInternal.isEmpty,
      s"column names $takenInternal are reserved internally by " +
        "pointInInterval; rename them before joining")
    // exact-matching contract ⇒ exact bucketing: a double-based
    // floor(v/w) rounds the 53-bit mantissa first and can misplace
    // values >= 2^53 (hash-derived positions, nano epochs) by a bucket,
    // silently losing pairs — so the domain is integral and buckets are
    // computed with exact long floor-division
    for ((df, c) <- Seq(points -> pointCol, intervals -> loCol,
        intervals -> hiCol)) {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      require(Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(df.schema(c).dataType),
        s"pointInInterval needs integral domain columns, got " +
          s"${df.schema(c).dataType.sql} for $c")
    }

    def bucketOf(c: org.apache.spark.sql.Column) = {
      val v = c.cast("long")
      // v - pmod(v, w) is the greatest multiple of w <= v (floor), and
      // being exactly divisible makes truncating integral `div` == the
      // exact quotient — pure long arithmetic, no double rounding
      call_function("div", v - pmod(v, lit(bucketWidth)), lit(bucketWidth))
    }

    val p = points.withColumn("__b", bucketOf(col(pointCol))).alias("__pt")
    val i = intervals
      .where(col(hiCol) >= col(loCol))
      .withColumn("__b",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
      .alias("__iv")
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (pk, ik) => col(s"__pt.$pk") === col(s"__iv.$ik") }
      .foldLeft(col("__pt.__b") === col("__iv.__b"))(_ && _)
    val contained =
      col(s"__pt.$pointCol") >= col(s"__iv.$loCol") &&
        col(s"__pt.$pointCol") <= col(s"__iv.$hiCol")
    val ivKeep = intervals.columns.filterNot(intervalKeys.contains)
    p.join(i, keyCond && contained)
      .select(points.columns.toSeq.map(c => col(s"__pt.$c")) ++
        ivKeep.map(c => col(s"__iv.$c")): _*)
  }
}
