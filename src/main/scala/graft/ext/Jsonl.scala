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

  /** All documents of all files: map-side line split, then codegen'd
    * FAILFAST `from_json` against [[Schema]] — a malformed line fails
    * the task loudly (production: feed `binaryFile` rows in here). */
  def docs(spark: SparkSession, files: DataFrame, fileIdCol: String,
           blobCol: String): DataFrame = {
    import spark.implicits._
    val lines = files.select(col(fileIdCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (fid, blob) =>
        splitLines(blob).map(l => (fid, l))
      })
      .toDF("file_id", "line")
    lines.select(col("file_id"),
        from_json(col("line"), Schema, Map("mode" -> "FAILFAST")).as("r"))
      .select(col("r.id").as("doc_id"), col("r.text"), col("r.lang"),
        col("r.source"), col("r.n_chars"))
  }
}
