package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd vector kernels for the similarity operators.
  *
  * The built-in higher-order functions (`aggregate`, `zip_with`) evaluate
  * their lambdas interpreted — per element, per row — which dominates the
  * similarity queries' runtime once candidate counts grow. These
  * expressions compile to tight primitive loops inside whole-stage
  * codegen (SURVEY.md §2.8: custom `Expression` only where built-ins
  * fall short — this is that case).
  *
  * Determinism contract: [[DotProduct]] accumulates STRICTLY sequentially
  * (i = 0..n-1), matching both the previous `aggregate`-fold plan shape
  * and DuckDB's evaluation order, so oracle comparisons stay
  * bit-identical.
  */
object VectorExpressions {

  def dotProduct(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def signProjection(vec: Column, planes: Seq[Seq[Double]]): Column =
    GraftExpressionBridge.column(
      SignProjection(GraftExpressionBridge.expression(vec), planes))
}

/** Σ a(i)·b(i) over min(|a|,|b|) elements, sequential order, double
  * precision. Inputs must be `array<double>` (cast upstream); null
  * array → null result; arrays must not contain null elements. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == ArrayType(DoubleType)) ||
        Seq(left, right).forall(_.dataType == ArrayType(DoubleType, containsNull = false)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $x[$i] * $y[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane sign bits: bit p of the result is set iff
  * vec · planes(p) ≥ 0. One pass over the vector per plane, all planes
  * in one expression — the whole LSH bucket key in a single codegen'd
  * kernel instead of nPlanes interpreted folds. */
case class SignProjection(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 64, "1..64 planes per bucket key")

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_sign_projection expects array<double>, got ${t.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_projection"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    var bits = 0L
    var p = 0
    while (p < matrix.length) {
      val w = matrix(p)
      val n = math.min(v.length, w.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v(i) * w(i); i += 1 }
      if (s >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |double[] $v = $c.toDoubleArray();
         |long $bits = 0L;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double[] $w = $mat[$p];
         |  int $n = Math.min($v.length, $w.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $v[$i] * $w[$i]; }
         |  if ($s >= 0.0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignProjection =
    copy(child = newChild)
}
