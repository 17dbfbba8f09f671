package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Morton (Z-order) key for multi-dimensional data clustering.
  *
  * Why: a table range-partitioned on ONE column prunes scans on that
  * column only; a 100 TB events table queried by `user_id` rectangles
  * one day and `value` bands the next needs file-level locality in BOTH.
  * Interleaving the bits of per-column quantile-bucket ranks gives every
  * file a small hyper-rectangle of the key space, so per-file min/max
  * stats prune scans for predicates on ANY prefix-free subset of the
  * clustered columns — the layout trick behind Delta `OPTIMIZE ZORDER
  * BY` / Hudi space-filling-curve clustering, built here from public
  * primitives: quantile bucketing + bit interleave + range partition.
  *
  * The bucket boundaries are expression fields (k·255 doubles ≈ KBs —
  * plan-weight-safe, unlike the LSH planes), computed once per write by
  * `approxQuantile` (a bounded one-pass planning collect, like the IVF
  * centroids).
  */
object ZOrderExpressions {
  /** Max clustered columns (at the default 8 bits each; fewer columns
    * may use more bits — the constraint is cols × bits ≤ 63). */
  val MaxCols = 8
  val BitsPerCol = 8

  def zValue(cols: Seq[Column], boundaries: Seq[Array[Double]],
             bitsPerCol: Int = BitsPerCol): Column =
    GraftExpressionBridge.column(
      ZValue(cols.map(GraftExpressionBridge.expression), boundaries,
        bitsPerCol))
}

/** Interleaved quantile-rank key: each child (cast to double upstream)
  * is ranked into 2^bitsPerCol buckets via binary search over its
  * sorted boundaries, and bit b of column c lands at output bit
  * `b·k + c`. Bucket RESOLUTION must grow with the clustered domain
  * (the ladder's zorder_files_read rung measures exactly this): at a
  * fixed 8 bits, a 10× corpus makes each bucket cover 10× more keys
  * and an absolute-size rectangle stops pruning — so
  * [[graft.sink.ZOrderLayout]] scales bits with the target file
  * count.
  * NULL ranks as bucket 0 (sorts first; range predicates null-reject,
  * so manifest pruning stays correct). NaN ranks last (bucket 255) —
  * `java.util.Arrays.binarySearch` orders NaN above +∞, matching the
  * `Double.compare` total order Spark sorts use. */
case class ZValue(children: Seq[Expression], boundaries: Seq[Array[Double]],
                  bitsPerCol: Int = ZOrderExpressions.BitsPerCol)
    extends Expression {
  require(children.nonEmpty && children.size <= ZOrderExpressions.MaxCols,
    s"z-order supports 1..${ZOrderExpressions.MaxCols} columns")
  require(bitsPerCol >= 1 && children.size * bitsPerCol <= 63,
    s"cols × bitsPerCol must fit a positive long, got " +
      s"${children.size} × $bitsPerCol")
  require(boundaries.size == children.size,
    "one boundary array per clustered column")
  require(boundaries.forall(_.length == (1 << bitsPerCol) - 1),
    s"each boundary array must have 2^$bitsPerCol - 1 entries")

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zvalue expects double inputs (cast upstream), got " +
        children.map(_.dataType.sql).mkString(", "))

  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    var z = 0L
    val k = children.size
    var c = 0
    while (c < k) {
      val v = children(c).eval(input)
      val bucket =
        if (v == null) 0
        else ZValue.bucketOf(boundaries(c), v.asInstanceOf[Double])
      var b = 0
      while (b < bitsPerCol) {
        if (((bucket >> b) & 1) == 1) z |= 1L << (b * k + c)
        b += 1
      }
      c += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val k = children.size
    val z = ctx.freshName("z")
    val parts = children.zipWithIndex.map { case (child, c) =>
      val bnd = ctx.addReferenceObj(s"zBoundaries$c", boundaries(c), "double[]")
      val childGen = child.genCode(ctx)
      val bucket = ctx.freshName("bucket")
      val b = ctx.freshName("b")
      s"""
         |${childGen.code}
         |int $bucket = ${childGen.isNull} ? 0 :
         |  graft.functions.ZValue.bucketOf($bnd, ${childGen.value});
         |for (int $b = 0; $b < $bitsPerCol; $b++) {
         |  if ((($bucket >> $b) & 1) == 1) $z |= 1L << ($b * $k + $c);
         |}
       """.stripMargin
    }
    val body: String = parts.mkString("\n")
    ev.copy(
      code = code"""
        |long $z = 0L;
        |$body
        """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(z, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(children = newChildren)
}

object ZValue {
  /** Bucket index in [0, len] for `v` against sorted boundaries: the
    * count of boundaries <= v, via binary search. Called from generated
    * code — must stay public, static-forwardable, and
    * allocation-free. */
  def bucketOf(bnd: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(bnd, v)
    if (i >= 0) {
      // land on a boundary: scan forward over duplicates so equal keys
      // always map to the SAME bucket regardless of search landing spot
      var j = i
      while (j < bnd.length - 1 && bnd(j + 1) == v) j += 1
      j + 1
    } else -(i + 1)
  }
}
