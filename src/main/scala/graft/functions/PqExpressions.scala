package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Codegen'd product-quantization kernels ([[graft.ext.Pq]]):
  * per-subspace encode (vector → m code BYTES), per-query ADC lookup
  * table (m × ksub partial dots), and the ADC score itself (m table
  * lookups per candidate — the scan kernel the compressed index
  * exists for).
  *
  * The codebooks ride in the expressions as ONE flat primitive double
  * array (m·ksub·subDim ≤ 128 KB at the dim-64/m-8/ksub-256 ceiling —
  * plan-weight-safe, reference-equality cheap in Catalyst passes;
  * the multi-MB [[LshPlanes]] regime this engine avoids starts two
  * orders of magnitude higher). Encode normalizes the input to unit
  * length first — the [[graft.ext.Pq]] contract that makes per-subspace
  * dots sum to an approximate cosine. */
object PqExpressions {

  def encode(vec: Column, model: graft.ext.Pq.Model): Column =
    GraftExpressionBridge.column(PqEncode(
      GraftExpressionBridge.expression(vec),
      flatten(model), model.m, model.ksub, model.subDim))

  /** Residual encode (the IVFADC form, Jégou et al. TPAMI 2011): codes
    * for `unit(vec) - cent`, where `cent` is the row's coarse-cell
    * centroid — the codebooks quantize residuals, which are far more
    * compact than raw positions, so the same code budget buys more
    * recall. The residual is NOT re-normalized (dot(q,x) =
    * dot(q,cent) + dot(q,residual) only holds for the raw residual). */
  def encodeResidual(vec: Column, cent: Column,
                     model: graft.ext.Pq.Model): Column =
    GraftExpressionBridge.column(PqEncodeResidual(
      GraftExpressionBridge.expression(vec),
      GraftExpressionBridge.expression(cent),
      flatten(model), model.m, model.ksub, model.subDim))

  def lut(vec: Column, model: graft.ext.Pq.Model): Column =
    GraftExpressionBridge.column(PqLut(
      GraftExpressionBridge.expression(vec),
      flatten(model), model.m, model.ksub, model.subDim))

  def adc(codes: Column, lut: Column, ksub: Int): Column =
    GraftExpressionBridge.column(PqAdc(
      GraftExpressionBridge.expression(codes),
      GraftExpressionBridge.expression(lut), ksub))

  private def flatten(model: graft.ext.Pq.Model): Array[Double] = {
    val out = new Array[Double](model.m * model.ksub * model.subDim)
    var j = 0
    while (j < model.m) {
      var c = 0
      while (c < model.ksub) {
        System.arraycopy(model.codebooks(j)(c), 0, out,
          (j * model.ksub + c) * model.subDim, model.subDim)
        c += 1
      }
      j += 1
    }
    out
  }
}

/** Static kernels shared by interpreted eval and generated code. */
object PqKernels {
  /** Unit-normalize in place into a fresh array; null for zero/len-mismatch. */
  def unitOrNull(v: Array[Double], dim: Int): Array[Double] = {
    if (v.length != dim) return null
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s == 0.0) return null
    val n = math.sqrt(s)
    val o = new Array[Double](v.length)
    i = 0
    while (i < v.length) { o(i) = v(i) / n; i += 1 }
    o
  }

  /** m code bytes for a unit vector against the flat codebooks. */
  def encode(u: Array[Double], flat: Array[Double], m: Int, ksub: Int,
             subDim: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * subDim
        var s = 0.0; var d = 0
        while (d < subDim) {
          val diff = u(j * subDim + d) - flat(base + d)
          s += diff * diff; d += 1
        }
        if (s < bd) { bd = s; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Codes for `unitOrNull(v) - cent` (residual/IVFADC encoding); null
    * on zero/mismatched `v` or a `cent` of the wrong dim. The residual
    * is deliberately NOT re-normalized. */
  def encodeResidual(v: Array[Double], cent: Array[Double], flat: Array[Double],
                     m: Int, ksub: Int, subDim: Int): Array[Byte] = {
    val u = unitOrNull(v, m * subDim)
    if (u == null || cent.length != u.length) return null
    var i = 0
    while (i < u.length) { u(i) -= cent(i); i += 1 }
    encode(u, flat, m, ksub, subDim)
  }

  /** m·ksub partial dots of a unit query against every codeword. */
  def lut(u: Array[Double], flat: Array[Double], m: Int, ksub: Int,
          subDim: Int): Array[Double] = {
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * subDim
        var s = 0.0; var d = 0
        while (d < subDim) { s += u(j * subDim + d) * flat(base + d); d += 1 }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    out
  }

  /** Σ_j lut[j·ksub + codes[j]] — the ADC score. */
  def adc(codes: Array[Byte], lut: Array[Double], ksub: Int): Double = {
    var s = 0.0; var j = 0
    while (j < codes.length) {
      s += lut(j * ksub + (codes(j) & 0xFF)); j += 1
    }
    s
  }
}

/** vector (array<double>, exactly `m·subDim` long) → m PQ code bytes.
  * Null input, wrong length, or the zero vector → null (surfacing
  * corruption, the [[DotProduct]] convention). */
case class PqEncode(child: Expression, flat: Array[Double],
                    m: Int, ksub: Int, subDim: Int)
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode expects array<double>, got ${t.sql}")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val u = PqKernels.unitOrNull(
      input.asInstanceOf[ArrayData].toDoubleArray(), m * subDim)
    if (u == null) null else PqKernels.encode(u, flat, m, ksub, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val u = ctx.freshName("u")
      s"""
         |double[] $u = graft.functions.PqKernels.unitOrNull(
         |  $c.toDoubleArray(), ${m * subDim});
         |if ($u == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  graft.functions.PqKernels.encode($u, $fl, $m, $ksub, $subDim); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** (vector, cell centroid) → m residual-PQ code bytes
  * ([[PqKernels.encodeResidual]]). Null input, wrong lengths, or the
  * zero vector → null. */
case class PqEncodeResidual(left: Expression, right: Expression,
                            flat: Array[Double],
                            m: Int, ksub: Int, subDim: Int)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode_residual expects (array<double>, array<double>), " +
          s"got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode_residual"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.encodeResidual(
      a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray(), flat, m, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("codes")
      s"""
         |byte[] $c = graft.functions.PqKernels.encodeResidual(
         |  $a.toDoubleArray(), $b.toDoubleArray(), $fl, $m, $ksub, $subDim);
         |if ($c == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $c; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeResidual =
    copy(left = newLeft, right = newRight)
}

/** query vector → ADC lookup table (array<double> of m·ksub). Same
  * null semantics as [[PqEncode]]. */
case class PqLut(child: Expression, flat: Array[Double],
                 m: Int, ksub: Int, subDim: Int)
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_lut expects array<double>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val u = PqKernels.unitOrNull(
      input.asInstanceOf[ArrayData].toDoubleArray(), m * subDim)
    if (u == null) null
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      PqKernels.lut(u, flat, m, ksub, subDim))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val u = ctx.freshName("u")
      s"""
         |double[] $u = graft.functions.PqKernels.unitOrNull(
         |  $c.toDoubleArray(), ${m * subDim});
         |if ($u == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |    graft.functions.PqKernels.lut($u, $fl, $m, $ksub, $subDim)); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** (codes binary, lut array<double>) → ADC score. A lut too short for
  * the codes (layout/model mismatch) → null, surfacing the corruption
  * rather than scoring garbage. */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (binary, array<double>), got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData].toDoubleArray()
    if (lut.length < codes.length * ksub) null
    else PqKernels.adc(codes, lut, ksub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lut = ctx.freshName("lut")
      s"""
         |double[] $lut = $b.toDoubleArray();
         |if ($lut.length < $a.length * $ksub) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.PqKernels.adc($a, $lut, $ksub); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
