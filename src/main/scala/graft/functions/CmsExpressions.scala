package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch point estimates as a codegen'd expression — the
  * probe side of Spark's own `count_min_sketch` aggregate.
  *
  * Use at 100 TB: per-key frequency estimates WITHOUT a full groupBy —
  * the sketch is one map-side-combinable aggregate whose result is KBs
  * regardless of key cardinality, and probing it is a map-side
  * projection. The canonical deployment here is hot-key diagnosis
  * before a big join (find the skew keys a salting pass must split)
  * where an exact per-key count would itself be the expensive shuffle.
  *
  * The sketch rides in the expression as its serialized bytes (KBs at
  * the eps/confidence this engine uses — plan-weight-safe, unlike the
  * LSH planes) and is deserialized once per generated-class instance
  * via [[Cms.readFrom]]. CMS guarantee: estimate is NEVER below the
  * true count, and exceeds it by more than eps·N with probability at
  * most (1 − confidence) per probed key — both sides of which the
  * `events_cms_check` oracle row pins. */
object CmsExpressions {
  def estimate(key: Column, sketchBytes: Array[Byte]): Column =
    GraftExpressionBridge.column(
      CmsEstimate(GraftExpressionBridge.expression(key), sketchBytes))
}

/** Static deserialization helper, callable from generated code. */
object Cms {
  def readFrom(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
}

/** `sketch.estimateCount(child)` for a LONG key — the key type the
  * `count_min_sketch` SQL aggregate hashes for integral columns. */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val sketch: CountMinSketch = Cms.readFrom(sketchBytes)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate expects bigint, got ${t.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(input: Any): Any =
    sketch.estimateCount(input.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("graftCmsBytes", sketchBytes, "byte[]")
    val sk = ctx.addMutableState("org.apache.spark.util.sketch.CountMinSketch",
      "graftCms", v => s"$v = graft.functions.Cms.readFrom($bytesRef);")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $sk.estimateCount((Object) java.lang.Long.valueOf($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
