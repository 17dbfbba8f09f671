package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines corpus support — the interchange format the public LLM
  * corpora actually ship in: Dolma, RedPajama, The Pile, FineWeb all
  * publish one JSON object per line, usually gzipped per file. A
  * corpus build both READS vendor jsonl(.gz) and WRITES its cleaned
  * output back as jsonl, so both directions are first-class. Extension
  * beyond the reference (SURVEY.md §2.8 north star: "another source
  * format").
  *
  * Scale design (the 100 TB contract):
  *  - the unit of parallelism is the FILE (vendors ship ~1 GiB shards):
  *    one blob row per file — in production via
  *    `spark.read.format("binaryFile")` — split into lines map-side;
  *    lines never span files, the blob never crosses a shuffle (the
  *    [[Multimodal]] rule). Splitting on the `\n` BYTE is UTF-8-safe
  *    (0x0A cannot occur inside a multi-byte sequence);
  *  - per-line parsing stays inside whole-stage codegen: `from_json`
  *    with an EXPLICIT schema (never inference — schema inference at
  *    100 TB is a full extra pass) in FAILFAST mode, so a corrupt
  *    vendor line surfaces instead of silently nulling;
  *  - the writer uses `to_json` (codegen'd, standards-compliant JSON
  *    escaping) and groups `docsPerFile` consecutive ids per file —
  *    one shuffle by file id, which production replaces with whatever
  *    sharding the output store wants.
  *
  * Gzip sharing: [[Warc.gzip]]/[[Warc.gunzipAll]] handle the `.gz`
  * form (whole-file member; multi-member concatenations inflate in the
  * same streaming pass).
  *
  * Shard-size bound: a `binaryFile` row materializes the COMPRESSED
  * shard as one JVM array, so each shard must stay under ~2 GiB even
  * though inflation streams — keep production shards at the
  * vendor-conventional ~1 GiB ([[TfRecordIo.requireShardsFit]] is the
  * loud dir-level guard for dir-based readers).
  */
object Jsonl {

  /** The Dolma-style record schema: explicit, never inferred. */
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** One JSON line per document via codegen'd `to_json` (correct
    * escaping for quotes/backslashes/control chars/astral unicode is
    * the library's problem, not a hand-rolled printf's). */
  private def jsonLine: org.apache.spark.sql.Column =
    to_json(struct(
      col("doc_id").as("id"), col("text"), col("lang"),
      col("source"), col("n_chars")))

  /** Fixture synthesis: wrap `documents` into JSONL files of
    * `docsPerFile` consecutive ids (file_id = doc_id / docsPerFile),
    * newline-terminated lines in ascending id order, compressed per
    * `codec` ("none" | "gzip" | "zstd" — the `.jsonl` / `.jsonl.gz` /
    * `.jsonl.zst` vendor layouts). Output: (file_id, blob). */
  def synthesize(spark: SparkSession, docs: DataFrame, idCol: String,
                 docsPerFile: Int, codec: String = "none"): DataFrame = {
    require(Set("none", "gzip", "zstd")(codec),
      s"jsonl: unknown codec '$codec' (none|gzip|zstd)")
    import spark.implicits._
    docs.select((col(idCol).cast("long") / docsPerFile).cast("long").as("file_id"),
        col(idCol).cast("long").as("doc_id"), jsonLine.as("line"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (fileId, it) =>
        val sb = new StringBuilder
        for ((_, _, line) <- it.toSeq.sortBy(_._2)) sb.append(line).append('\n')
        val bytes = sb.toString.getBytes(UTF_8)
        (fileId, codec match {
          case "gzip" => Warc.gzip(bytes)
          case "zstd" => Warc.zstd(bytes)
          case _ => bytes
        })
      }
      .toDF("file_id", "blob")
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Split one file's bytes into lines: single forward scan over the
    * byte array, one String copy per line, no regex. A final line
    * without a trailing newline is still a record (vendors disagree on
    * the last byte). Gzip/zstd input is magic-sniffed and inflated
    * first — sound for JSONL, whose raw prelude is printable ASCII and
    * cannot collide with either magic (unlike TFRecord framing). */
  private[ext] def splitLines(bytesIn: Array[Byte]): Seq[String] = {
    val bytes =
      if (isGzip(bytesIn)) Warc.gunzipAll(bytesIn)
      else if (Warc.isZstd(bytesIn)) Warc.unzstdAll(bytesIn)
      else bytesIn
    val out = Vector.newBuilder[String]
    var from = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == '\n') {
        if (i > from) out += new String(bytes, from, i - from, UTF_8)
        from = i + 1
      }
      i += 1
    }
    if (from < bytes.length)
      out += new String(bytes, from, bytes.length - from, UTF_8)
    out.result()
  }

  /** Longest single line the inference probe will buffer: a line past
    * this is not JSONL (a single-line JSON array file, a binary drop)
    * and buffering on toward a newline that never comes would inflate
    * the whole shard — the exact unbounded read the probe exists to
    * avoid. Loud failure names the remedy. */
  private[ext] val MaxProbeLineBytes: Int = 16 * 1024 * 1024

  /** Streaming head probe: the first `n` non-empty lines of one shard,
    * read off the (decompressing) input byte-by-byte and stopped after
    * `n` newlines — the whole shard is never inflated for a bounded
    * sample (same lazy-decompression discipline as
    * [[Warc.recordIterator]]); a single line past [[MaxProbeLineBytes]]
    * fails loudly instead of buffering the shard. Used by
    * [[inferSchema]] only; the full parse keeps [[splitLines]]' single
    * array scan. */
  private[ext] def headLines(bytesIn: Array[Byte], n: Int): Seq[String] = {
    val base = new java.io.ByteArrayInputStream(bytesIn)
    val in: java.io.InputStream =
      if (isGzip(bytesIn)) new java.util.zip.GZIPInputStream(base, 64 * 1024)
      else if (Warc.isZstd(bytesIn))
        new com.github.luben.zstd.ZstdInputStream(base)
      else base
    val buf = new java.io.BufferedInputStream(in, 64 * 1024)
    try {
      val out = Vector.newBuilder[String]
      var taken = 0
      val bos = new java.io.ByteArrayOutputStream(256)
      var b = buf.read()
      while (taken < n && b >= 0) {
        if (b == '\n') {
          if (bos.size() > 0) { // empty lines skip, as in splitLines
            out += new String(bos.toByteArray, UTF_8)
            taken += 1
            bos.reset()
          }
        } else {
          if (bos.size() >= MaxProbeLineBytes)
            throw new IllegalArgumentException(
              s"jsonl: a single line exceeds $MaxProbeLineBytes bytes - " +
                "this is not JSONL (single-line JSON array? binary?); " +
                "supply an explicit schema or fix the shard format")
          bos.write(b)
        }
        if (taken < n) b = buf.read()
      }
      if (taken < n && bos.size() > 0) // final unterminated line counts
        out += new String(bos.toByteArray, UTF_8)
      out.result()
    } finally {
      // close eagerly: zstd-jni holds native memory that must not wait
      // for GC, and the stream is abandoned mid-shard by design
      try buf.close() catch { case _: Throwable => () }
    }
  }

  /** Schema inference over vendor `.jsonl(.gz|.zst)` without a schema
    * contract: sample the HEAD of EVERY shard (not just the first —
    * the [[TfRecordIo.inferSchema]] lesson: a field first appearing in
    * a later shard must not silently vanish), run Spark's own JSON
    * inference over the sampled lines, and return the inferred struct.
    * The probe is ONE bounded extra pass over shard heads
    * (`sampleLines` lines each, streamed off the decompressor without
    * inflating the shard), not a full second scan — the 100 TB-honest
    * form of "infer then read". */
  def inferSchema(spark: SparkSession, files: DataFrame, blobCol: String,
                  sampleLines: Int = 100): StructType = {
    import spark.implicits._
    val heads = files.select(col(blobCol)).as[Array[Byte]]
      .mapPartitions(_.flatMap(blob => headLines(blob, sampleLines)))
    val inferred = spark.read
      .option("mode", "FAILFAST")
      .json(heads)
      .schema
    require(inferred.fields.nonEmpty, "jsonl: inference found no fields")
    inferred
  }

  /** [[docs]] with the schema INFERRED from the shards ([[inferSchema]])
    * instead of the explicit contract — the vendor-drop scenario where
    * no schema ships with the data. Still FAILFAST: a line that breaks
    * the inferred schema fails loudly rather than nulling. Fields a
    * shard omits past its sampled head read as null (disclosed by the
    * bounded-sample contract). The probe and the parse are TWO Spark
    * jobs over `files`: with `binaryFile` input that is the documented
    * bounded head re-read, but a DERIVED `files` lineage (an upstream
    * shuffle or synthesis) re-executes for the probe — persist `files`
    * first if its lineage is expensive (the caller owns that choice;
    * auto-persisting corpus-sized blobs here would be the wrong 100 TB
    * default). */
  def docsInferred(spark: SparkSession, files: DataFrame, fileIdCol: String,
                   blobCol: String, sampleLines: Int = 100): DataFrame = {
    val schema = inferSchema(spark, files, blobCol, sampleLines)
    parseLines(spark, files, fileIdCol, blobCol, schema)
  }

  /** Map-side line split + codegen'd FAILFAST `from_json` against the
    * given schema, one column per parsed field. Field extraction uses
    * `getField` with the LITERAL name, so vendor keys containing dots
    * or backticks resolve instead of being parsed as nested paths. A
    * schema field named `file_id` would silently collide with the
    * reader's own file-id column — rejected loudly instead. */
  def parseLines(spark: SparkSession, files: DataFrame, fileIdCol: String,
                 blobCol: String, schema: StructType): DataFrame = {
    import spark.implicits._
    require(!schema.fieldNames.contains("file_id"),
      "jsonl: schema field 'file_id' collides with the reader's file-id " +
        "column - rename the data field or parse with your own schema")
    val lines = files.select(col(fileIdCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (fid, blob) =>
        splitLines(blob).map(l => (fid, l))
      })
      .toDF("file_id", "line")
    lines.select(col("file_id"),
        from_json(col("line"), schema, Map("mode" -> "FAILFAST")).as("r"))
      .select((col("file_id") +:
        schema.fieldNames.toSeq.map(f => col("r").getField(f).as(f))): _*)
  }

  /** All documents of all files: [[parseLines]] against the explicit
    * [[Schema]] contract — a malformed line fails the task loudly
    * (production: feed `binaryFile` rows in here). */
  def docs(spark: SparkSession, files: DataFrame, fileIdCol: String,
           blobCol: String): DataFrame =
    parseLines(spark, files, fileIdCol, blobCol, Schema)
      .select(col("id").as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
}
