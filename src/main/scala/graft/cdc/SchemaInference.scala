package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.collection.concurrent.TrieMap

/** Per-table JSON payload schema inference with an optional cache.
  *
  * The reference infers the payload schema from scratch for *every* table
  * in *every* micro-batch by re-reading the filtered strings
  * (`/root/reference/glue/cdc_hudi.py:234`) — a full extra scan per table
  * per batch. That buys automatic schema evolution (new columns appear in
  * the next batch's inferred schema, `glue/cdc_hudi.py:205,234`).
  *
  * Two modes:
  *  - [[Mode.InferAlways]]: reference parity — one inference scan per
  *    table per batch; evolution is instantaneous.
  *  - [[Mode.Cached]]: the 100 TB-scale path — infer once per table, then
  *    reuse; the pipeline revalidates by counting parse failures on the
  *    already-cached batch and re-infers (merging old ∪ new) only when a
  *    record no longer fits. New *optional* columns are picked up on
  *    re-inference triggers or via [[invalidate]].
  */
object SchemaInference {

  sealed trait Mode
  object Mode {
    case object InferAlways extends Mode
    case object Cached extends Mode
  }

  private val cache = TrieMap.empty[String, StructType]

  /** Rows sampled for the initial cached-mode inference. A schema is a
    * low-entropy property — tokenizing the whole batch to learn it is a
    * full extra scan for nothing. Detection caveat: the corrupt-record
    * probe only catches records the cached schema cannot PARSE (type
    * conflicts, malformed JSON) — PERMISSIVE `from_json` silently ignores
    * extra fields, so a column ADDED after the sampled prefix is invisible
    * to the probe and is picked up on the next `revalidateEvery` tick
    * (periodic [[refresh]] re-inference), not immediately. Parity mode
    * (InferAlways) still scans everything like the reference and sees new
    * columns in the same batch. */
  val CachedSampleRows = 10000

  /** Single inference pass (Spark's native JSON inference, executors do
    * the tokenizing; no RDD hop — `spark.read.json(Dataset[String])`). */
  def infer(spark: SparkSession, values: Dataset[String]): StructType =
    spark.read.json(values).schema

  def forTable(spark: SparkSession, key: String, values: Dataset[String],
               mode: Mode): StructType = mode match {
    case Mode.InferAlways => infer(spark, values)
    case Mode.Cached =>
      cache.getOrElseUpdate(key, infer(spark, values.limit(CachedSampleRows)))
  }

  /** Merge-and-refresh after a detected evolution: union of old and new
    * fields so columns never silently vanish mid-stream (the keyed sink
    * handles null-padding, SURVEY.md §7.4.1-2). */
  def refresh(spark: SparkSession, key: String, values: Dataset[String]): StructType = {
    val fresh = infer(spark, values)
    val merged = cache.get(key).map(old => mergeStructs(old, fresh)).getOrElse(fresh)
    cache.put(key, merged)
    merged
  }

  def invalidate(key: String): Unit = cache.remove(key)
  def clearAll(): Unit = cache.clear()
  def cached(key: String): Option[StructType] = cache.get(key)

  /** Field-union merge with numeric widening on conflicts (long→double,
    * anything-vs-string→string), recursing into structs. */
  def mergeStructs(a: StructType, b: StructType): StructType = {
    import org.apache.spark.sql.types._
    def mergeType(x: DataType, y: DataType): DataType = (x, y) match {
      case (s: StructType, t: StructType) => mergeStructs(s, t)
      case (ArrayType(e1, n1), ArrayType(e2, n2)) => ArrayType(mergeType(e1, e2), n1 || n2)
      case (p, q) if p == q => p
      // An all-null column infers as NullType; adopt the concrete type on
      // merge instead of falling through to the StringType catch-all.
      case (NullType, t) => t
      case (t, NullType) => t
      case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      case (IntegerType, DoubleType) | (DoubleType, IntegerType) => DoubleType
      case _ => StringType
    }
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { f =>
      bByName.get(f.name) match {
        case Some(g) => StructField(f.name, mergeType(f.dataType, g.dataType), nullable = true)
        case None    => f.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    StructType(merged ++ b.fields.filterNot(f => aNames(f.name)).map(_.copy(nullable = true)))
  }
}
