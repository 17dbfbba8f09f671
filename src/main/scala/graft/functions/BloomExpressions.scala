package graft.functions

import graft.util.SerializableHadoopConf

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd expression — the
  * 100 TB-scale prefilter for set-membership semi-joins.
  *
  * Why this exists: [[graft.ext.Decontamination]] broadcasts the exact
  * benchmark gram SET. That is right while eval suites are MBs, but a
  * composed benchmark battery (every heldout split of every suite, at
  * 8-gram granularity) can reach 100s of MBs of distinct grams —
  * broadcast-hostile. A Bloom filter over the same set is ~1.2 bytes/key
  * at 1% fpp, two orders of magnitude smaller, and a map-side
  * `might_contain` probe drops ~99% of the corpus gram stream BEFORE any
  * shuffle; only the surviving trickle (true hits + fpp·|grams|) joins
  * the exact stored set, so the final report stays EXACT — the fpp
  * affects intermediate volume, never the answer.
  *
  * The filter itself is NOT an expression field: a multi-MB sketch in
  * the plan tree would be re-shipped with every task binary and paid on
  * every Catalyst `equals`/`hashCode` pass (the [[LshPlanes]] lesson).
  * The expression carries only the index PATH plus the DRIVER's Hadoop
  * configuration ([[graft.util.SerializableHadoopConf]] — executors
  * have no active SparkSession, and a bare `new Configuration()` there
  * would drop `spark.hadoop.*` object-store credentials and
  * `fs.<scheme>.impl` bindings); each executor JVM loads and caches the
  * sketch once via [[BloomRegistry]], through the Hadoop
  * [[org.apache.hadoop.fs.FileSystem]] API so the path may live on
  * `file://`, `hdfs://`, or an object store — the same seam as
  * [[graft.util.TableFs]].
  */
object BloomExpressions {
  def mightContain(text: Column, bloomPath: String): Column =
    GraftExpressionBridge.column(
      BloomMightContain(GraftExpressionBridge.expression(text), bloomPath,
        new SerializableHadoopConf(driverConf())))

  /** The DRIVER-side Hadoop configuration, captured at Column
    * construction time (always on the driver, where a session is
    * active); the bare-`Configuration` fallback only fires in
    * sessionless unit code, never on the executor path. */
  private def driverConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
}

/** Per-JVM cache of deserialized Bloom sketches, keyed by
  * (path, length, modTime) so an overwritten index file is re-read
  * rather than served stale. The caller supplies the Hadoop
  * configuration — on executors that is the DRIVER's conf, shipped
  * inside the probing expression ([[SerializableHadoopConf]]). */
object BloomRegistry {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long), BloomFilter]

  def load(path: String, conf: SerializableHadoopConf): BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    val st = fs.getFileStatus(p)
    cache.getOrElseUpdate((path, st.getLen, st.getModificationTime), {
      val in = fs.open(p)
      try BloomFilter.readFrom(in) finally in.close()
    })
  }
}

/** `bloom.mightContainBinary(utf8(child))` — byte-identical hashing to
  * the `putString` the build side used (`putString` hashes the UTF-8
  * encoding, which is exactly what `UTF8String.getBytes` yields), so a
  * gram inserted as a JVM String and probed as a Spark UTF8String always
  * matches. Null text → null; never a false NEGATIVE (Bloom contract),
  * so an `inner` verify join downstream loses no true hit. */
case class BloomMightContain(child: Expression, bloomPath: String,
                             conf: SerializableHadoopConf)
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomRegistry.load(bloomPath, conf)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain expects string, got ${t.sql}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // One registry load per generated class instance (≈ once per task),
    // served from the per-JVM cache after the first task touches it.
    val pathRef = ctx.addReferenceObj("graftBloomPath", bloomPath, "java.lang.String")
    val confRef = ctx.addReferenceObj("graftBloomConf", conf,
      "graft.util.SerializableHadoopConf")
    val bf = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloom",
      v => s"$v = graft.functions.BloomRegistry.load($pathRef, $confRef);")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $bf.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
