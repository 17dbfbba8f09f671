package graft.ext

import graft.util.SerializableHadoopConf

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro Object Container File source/sink built directly on the
  * public `org.apache.avro` core library (no `spark-avro` connector in
  * this sandbox): the row-interchange format CDC buses and data lakes
  * actually ship, alongside the JSONL / ORC / CSV round-trip family.
  *
  * - [[write]]: one container file per NON-EMPTY partition, streamed
  *   record-at-a-time through a `DataFileWriter` onto the Hadoop FS
  *   seam (the [[SerializableHadoopConf]] discipline — object-store
  *   credentials and `fs.<scheme>.impl` bindings ship with the task,
  *   never re-derived executor-side). No bytes are buffered beyond
  *   Avro's own block buffer; no shuffle, no driver collect.
  * - [[read]]: `binaryFile` scan (file-per-task parallelism, the
  *   [[Warc]] discipline) decoded map-side with a `DataFileStream`.
  *   The caller passes the expected Spark schema — Avro containers
  *   are self-describing, but a production 100 TB read wants a FIXED
  *   read schema so a drifted producer fails fast instead of
  *   poisoning downstream types (the Jsonl FAILFAST stance).
  *
  * Type mapping (both directions, null via `union(null, T)`):
  * long/int/double/float/boolean direct, string <-> Utf8,
  * binary <-> ByteBuffer. That subset covers every flat interchange
  * row in the suite; nested rows belong in parquet/ORC, not an
  * interchange container.
  */
object AvroIo {

  /** Avro record schema for a flat Spark schema; nullable fields
    * become `union(null, T)` with a null default. */
  def avroSchema(st: StructType, name: String = "graft_row"): Schema = {
    def base(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"AvroIo supports flat interchange types only, got $other")
    }
    val fields = st.fields.map { f =>
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(List(Schema.create(Schema.Type.NULL), base(f.dataType)).asJava),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, base(f.dataType), null, null.asInstanceOf[Object])
    }
    Schema.createRecord(name, null, "graft.ext", false, fields.toList.asJava)
  }

  private def toAvro(v: Any): AnyRef = v match {
    case null              => null
    case b: Array[Byte]    => ByteBuffer.wrap(b)
    case s: String         => new Utf8(s)
    case other             => other.asInstanceOf[AnyRef]
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any = v match {
    case null          => null
    case u: Utf8       => u.toString
    case s: CharSequence => s.toString
    case bb: ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case other         => other
  }

  /** Write `df` as `part-<pid>.avro` container files under `dir`.
    * The target directory is prepared on the driver first: created if
    * absent and cleared of stale `*.avro` part files, so a re-write
    * with fewer partitions cannot leave phantom parts from a previous
    * wider write behind (the `mode("overwrite")` semantics of Spark's
    * own sinks), and an all-empty write still leaves a readable empty
    * dir. Each task streams into an attempt-unique `.tmp` file and
    * COMMITS via rename — rename-won't-replace on every production FS,
    * so with speculative execution or a zombie attempt the first
    * committer wins and the loser deletes its tmp; a torn half-written
    * container can never sit at the final path. Empty partitions
    * produce no file — repartition upstream to size the files. */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val spark = df.sparkSession
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dfs.mkdirs(dirPath)
    val stale = dfs.globStatus(new Path(dirPath, "*.avro*"))
    if (stale != null) stale.foreach(s => dfs.delete(s.getPath, false))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = TaskContext.get()
        val schema = new Schema.Parser().parse(schemaJson)
        val finalPath =
          new Path(dir, f"part-${tc.partitionId()}%05d.avro")
        val tmpPath = new Path(dir,
          f"part-${tc.partitionId()}%05d.avro.${tc.taskAttemptId()}%d.tmp")
        val fs = finalPath.getFileSystem(conf.value)
        val out = fs.create(tmpPath, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        try {
          w.create(schema, out) // DataFileWriter closes `out` on close()
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < st.length) { rec.put(i, toAvro(row.get(i))); i += 1 }
            w.append(rec)
          }
        } finally w.close()
        // commit: first attempt to rename wins; a losing duplicate
        // attempt finds the destination taken and discards its tmp
        if (!fs.rename(tmpPath, finalPath)) {
          fs.delete(tmpPath, false)
          if (!fs.exists(finalPath)) throw new java.io.IOException(
            s"avro commit failed: could not rename $tmpPath to $finalPath")
        }
      }
    }
  }

  /** Read every `*.avro` container under `dir` with the given read
    * schema: file-per-task `binaryFile` scan, map-side
    * `DataFileStream` decode. Field lookup is BY NAME against the
    * reader schema, so producer-side field reordering is tolerated and
    * a missing field fails fast. */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    val names = st.fields.map(_.name)
    val dts = st.fields.map(_.dataType)
    // same single-array bound as the tfrecord reader: a container over
    // ~2 GiB would die in an opaque allocation inside the scan
    TfRecordIo.requireShardsFit(spark, dir, Seq(".avro"), label = "avro")
    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(dir)
      .select("content")
    val enc = Encoders.row(st)
    blobs.as(Encoders.BINARY).mapPartitions { it =>
      it.flatMap { bytes =>
        val r = new DataFileStream[GenericRecord](
          new ByteArrayInputStream(bytes),
          new GenericDatumReader[GenericRecord]())
        // hasNext-driven close only fires when the iterator drains; a
        // downstream limit/take or task failure would otherwise leak
        // the stream (and pin the blob) — close on task completion too
        // (idempotent; DataFileStream.close tolerates a second call)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          try r.close() catch { case _: java.io.IOException => }
        }
        val writerSchema = r.getSchema
        val pos = names.map { n =>
          val f = writerSchema.getField(n)
          if (f == null) throw new IllegalArgumentException(
            s"avro container lacks required field '$n' (writer schema: $writerSchema)")
          f.pos()
        }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = r.hasNext; if (!h) r.close(); h }
          def next(): Row = {
            val rec = r.next()
            val vals = new Array[Any](names.length)
            var i = 0
            while (i < names.length) {
              vals(i) = fromAvro(rec.get(pos(i)), dts(i)); i += 1
            }
            new GenericRowWithSchema(vals, st)
          }
        }
      }
    }(enc)
  }
}
