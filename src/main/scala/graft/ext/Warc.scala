package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record (top-level so the case-class encoder stays on
  * the codegen path — the [[AudioMetaRow]] lesson). */
private[ext] case class WarcRecordRow(file_id: Long, rec_idx: Int,
    warc_type: String, target_uri: String, record_id: String,
    warc_date: String, content_type: String, content_length: Long,
    text: String)

/** WARC / WET container support — the format 100 TB of LLM training
  * data actually ARRIVES in: Common Crawl publishes crawls as
  * `.warc.gz` (raw HTTP captures) and `.wet.gz` (extracted-text
  * "conversion" records), per ISO 28500 / the WARC 1.1 spec. CCNet,
  * Dolma, RefinedWeb, and every public web-corpus pipeline starts by
  * parsing exactly these files. Extension beyond the reference
  * (SURVEY.md §2.8 north star: "another source format").
  *
  * Scale design (the 100 TB contract):
  *  - the unit of parallelism is the FILE (Common Crawl ships ~1 GiB
  *    segments, ~72k per crawl): one blob row per file — in production
  *    via `spark.read.format("binaryFile")` — parsed map-side with
  *    [[parseRecords]]; records never span files so no cross-partition
  *    coordination exists, and the blob never crosses a shuffle (the
  *    [[Multimodal]] rule);
  *  - parsing is a single forward STREAM ([[recordIterator]]): headers
  *    are decoded line-by-line off the input, each payload is ONE copy
  *    (the `Content-Length` read) — no regex over the full file, no
  *    line-splitting of megabyte blocks, and one record resident at a
  *    time;
  *  - gzip: Common Crawl writes one gzip MEMBER per record so readers
  *    can split; the record stream runs THROUGH a multi-member
  *    `GZIPInputStream` (JDK handles member boundaries), so a shard
  *    that inflates 3-4× past its compressed size never materializes a
  *    whole-file inflated copy — past the 2 GB array bound that copy
  *    could not even exist. [[gunzipAll]] remains for whole-buffer
  *    callers (JSONL). The COMPRESSED shard itself still rides one
  *    `binaryFile` array, so shards must stay under ~2 GiB — Common
  *    Crawl's ~1 GiB segments fit with headroom
  *    ([[TfRecordIo.requireShardsFit]] is the loud dir-level guard).
  *
  * The writer side ([[synthesizeWet]]) exists for the fixture: the
  * corpus has no WARC files, so documents are wrapped into REAL WET
  * files (warcinfo + one conversion record per doc, CRLF framing,
  * Content-Length octets) and the oracle checks the parse recovers the
  * corpus byte-for-byte — the container round-trip is what the gate
  * tests, and a production run replaces only the synthesis with
  * `binaryFile` reads of published crawls.
  */
object Warc {

  val Version = "WARC/1.0"
  private val Crlf = "\r\n"

  /** Fixed warcinfo block so the per-file byte arithmetic is
    * oracle-computable (see `warc_files_meta`). */
  val WarcinfoBlock: String = "software: graft-wet/1.0\r\nformat: WARC File Format 1.0\r\n"
  val FixtureDate = "2026-01-01T00:00:00Z"

  def targetUri(docId: Long): String = s"https://example.com/doc/$docId"

  private def record(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder(Version).append(Crlf)
    for ((k, v) <- headers) h.append(k).append(": ").append(v).append(Crlf)
    h.append("Content-Length: ").append(block.length).append(Crlf).append(Crlf)
    val head = h.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  def warcinfoRecord(fileId: Long): Array[Byte] = record(Seq(
    "WARC-Type" -> "warcinfo",
    "WARC-Record-ID" -> s"<urn:graft:file:$fileId>",
    "WARC-Date" -> FixtureDate,
    "Content-Type" -> "application/warc-fields"),
    WarcinfoBlock.getBytes(UTF_8))

  def conversionRecord(docId: Long, text: String): Array[Byte] = record(Seq(
    "WARC-Type" -> "conversion",
    "WARC-Target-URI" -> targetUri(docId),
    "WARC-Record-ID" -> s"<urn:graft:doc:$docId>",
    "WARC-Date" -> FixtureDate,
    "Content-Type" -> "text/plain"),
    text.getBytes(UTF_8))

  /** One WET file: a warcinfo record then one conversion record per
    * (docId, text), docs in ascending id order. */
  def buildWetFile(fileId: Long, docs: Seq[(Long, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(warcinfoRecord(fileId))
    for ((id, text) <- docs.sortBy(_._1))
      out.write(conversionRecord(id, text))
    out.toByteArray
  }

  /** Gzip with one member per record boundary is how Common Crawl
    * writes; for the fixture, one member per whole file exercises the
    * same multi-member reader when files are concatenated. `perRecord`
    * re-compresses each record as its own member (the CC layout). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(bytes); g.close(); bos.toByteArray
  }

  def gzipPerRecord(records: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    for (r <- records) bos.write(gzip(r))
    bos.toByteArray
  }

  /** Inflate ALL concatenated gzip members (JDK GZIPInputStream already
    * advances across member boundaries). Single streaming pass. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Zstandard twins of the gzip helpers — the `.zst` form the
    * Dolma/RedPajama-era corpora ship. Spark bundles zstd-jni, so this
    * is offline-safe; the read loop drains concatenated frames the way
    * [[gunzipAll]] drains concatenated gzip members. */
  def zstd(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(bytes); z.close(); bos.toByteArray
  }

  def unzstdAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val out = new ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close() // zstd-jni native context, not GC-managed
  }

  /** Zstd frame magic `28 b5 2f fd` — unlike the TFRecord/gzip pair,
    * no JSONL or WARC prelude can collide with it (a JSON line starts
    * with printable ASCII), so magic-sniffing is sound here. */
  private[ext] def isZstd(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd

  /** Stream every record of one WARC file off `in` — header lines read
    * byte-by-byte (each bounded by the loud CRLF requirement), ONE
    * payload copy per record, malformed framing fails loudly (a corrupt
    * crawl segment should surface, not silently truncate). Streaming is
    * the 100 TB shape: a gzip/multi-member `.wet.gz` shard wrapped in a
    * `GZIPInputStream` keeps ONE record resident at a time instead of a
    * whole-file inflated copy (Common Crawl segments inflate 3-4× past
    * their ~1 GiB compressed size — past the 2 GB array bound a
    * whole-file copy cannot even exist). */
  def recordIterator(fileId: Long, in: java.io.InputStream): Iterator[WarcRecordRow] =
    new scala.collection.AbstractIterator[WarcRecordRow] {
      private var idx = 0
      private var off = 0L // decompressed offset, for loud messages
      private var nextRow: WarcRecordRow = _
      private def readFully(arr: Array[Byte], what: String): Unit = {
        var got = 0
        while (got < arr.length) {
          val r = in.read(arr, got, arr.length - got)
          require(r >= 0, s"warc: truncated $what at offset $off " +
            s"(eof after $got of ${arr.length} bytes)")
          got += r
        }
        off += arr.length
      }
      /** One CRLF-terminated header line; None on clean EOF at a record
        * boundary (only when `optionalEof`). */
      private def line(optionalEof: Boolean): Option[String] = {
        val first = in.read()
        if (first < 0) {
          require(optionalEof, s"warc: truncated record at offset $off")
          return None
        }
        val buf = new ByteArrayOutputStream(96)
        var b = first
        while (true) {
          require(b >= 0, s"warc: unterminated header line at offset $off")
          if (b == '\n') {
            val arr = buf.toByteArray
            require(arr.nonEmpty && arr(arr.length - 1) == '\r',
              s"warc: bare LF in header at offset $off")
            off += arr.length + 1
            return Some(new String(arr, 0, arr.length - 1, UTF_8))
          }
          buf.write(b)
          b = in.read()
        }
        None // unreachable
      }
      private def advance(): Unit = {
        nextRow = null
        val verOpt = line(optionalEof = true)
        if (verOpt.isEmpty) {
          // close at clean EOF: decompressor wrappers (zstd-jni
          // especially) hold native memory that must not wait for GC
          try in.close() catch { case _: Throwable => () }
          return
        }
        val ver = verOpt.get
        require(ver.startsWith("WARC/"), s"warc: bad version '$ver' at offset $off")
        var typ = ""; var uri = ""; var rid = ""; var date = ""
        var ctype = ""; var clen = -1L
        var l = line(optionalEof = false).get
        while (l.nonEmpty) {
          val colon = l.indexOf(':')
          require(colon > 0, s"warc: malformed header '$l'")
          val k = l.substring(0, colon).trim.toLowerCase
          val v = l.substring(colon + 1).trim
          k match {
            case "warc-type"       => typ = v
            case "warc-target-uri" => uri = v
            case "warc-record-id"  => rid = v
            case "warc-date"       => date = v
            case "content-type"    => ctype = v
            case "content-length"  => clen = v.toLong
            case _                 => // unknown headers are legal; skip
          }
          l = line(optionalEof = false).get
        }
        require(clen >= 0, "warc: record without Content-Length")
        require(clen <= Int.MaxValue - 8,
          s"warc: implausible Content-Length $clen at offset $off")
        val block = new Array[Byte](clen.toInt)
        readFully(block, "block")
        val term = new Array[Byte](4)
        readFully(term, "record terminator")
        require(term(0) == '\r' && term(1) == '\n' &&
          term(2) == '\r' && term(3) == '\n',
          s"warc: missing record terminator at offset $off")
        // conversion/warcinfo blocks are UTF-8 by the WET convention;
        // response blocks are HTTP messages whose BODY charset must be
        // resolved (BOM -> Content-Type -> <meta> -> UTF-8/latin-1), so
        // the head/body split happens at the BYTE level before any decode
        // (decoding first would already have mojibaked legacy payloads).
        val text =
          if (typ == "response") decodeHttpResponse(block, 0, block.length)
          else if (typ == "conversion" || typ == "warcinfo")
            new String(block, UTF_8)
          else ""
        nextRow = WarcRecordRow(fileId, idx, typ, uri, rid, date, ctype, clen, text)
        idx += 1
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): WarcRecordRow = {
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow; advance(); r
      }
    }

  /** Lazy per-file record stream over an in-memory blob; gzip/zstd are
    * magic-sniffed (SOUND here, unlike TFRecord: a raw record starts
    * with the ASCII bytes `WARC/`, which cannot collide with `1f 8b`
    * or `28 b5 2f fd`) and inflated STREAMING through the same
    * iterator. */
  def recordStream(fileId: Long, bytesIn: Array[Byte]): Iterator[WarcRecordRow] = {
    val base = new java.io.ByteArrayInputStream(bytesIn)
    val in: java.io.InputStream =
      if (isGzip(bytesIn)) new GZIPInputStream(base, 64 * 1024)
      else if (isZstd(bytesIn))
        new com.github.luben.zstd.ZstdInputStream(base)
      else base
    recordIterator(fileId, new java.io.BufferedInputStream(in, 64 * 1024))
  }

  /** Eager form of [[recordStream]] (specs + small fixtures). */
  def parseRecords(fileId: Long, bytesIn: Array[Byte]): Seq[WarcRecordRow] =
    recordStream(fileId, bytesIn).toVector

  /** Charset-aware decode of an HTTP response block: the head is
    * latin-1 by RFC 9112 (octets are ASCII-compatible), the body is
    * first restored at the BYTE level — `Transfer-Encoding: chunked`
    * framing removed, then `Content-Encoding: gzip/x-gzip/deflate`
    * inflated (that order: chunking is the outermost layer the sender
    * applied) — and only then charset-resolved via
    * [[CharsetDetect.decode]] against the head's own `Content-Type`.
    * Common Crawl stores bodies AS RECEIVED, so real `response` records
    * carry both layers; decoding without this step mojibakes gzip
    * bodies and leaks chunk-size lines into [[HtmlExtract]]. Corrupt
    * encoding fails SOFT to the raw bytes (a crawl shard must not die
    * on one truncated capture). A head-only block (no CRLFCRLF) decodes
    * as latin-1 and fails loudly downstream in [[httpBody]] — the same
    * corrupt-segment discipline as the framing requires. */
  private def decodeHttpResponse(bytes: Array[Byte], off: Int, len: Int): String = {
    var i = off
    val end = off + len
    while (i + 3 < end && !(bytes(i) == '\r' && bytes(i + 1) == '\n' &&
      bytes(i + 2) == '\r' && bytes(i + 3) == '\n')) i += 1
    if (i + 3 >= end)
      return new String(bytes, off, len, java.nio.charset.StandardCharsets.ISO_8859_1)
    val head = new String(bytes, off, i - off,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // one head split per record (this runs once per crawl capture): the
    // three header lookups share it instead of re-splitting each time
    val headerLines = head.split("\r\n")
    def header(name: String): String = headerLines.iterator
      .find(_.toLowerCase.startsWith(name + ":"))
      .map(_.substring(name.length + 1).trim).getOrElse("")
    val ctype = header("content-type")
    val bodyOff = i + 4
    val chunked = header("transfer-encoding").toLowerCase.contains("chunked")
    val cenc = header("content-encoding").toLowerCase
    val encoded = cenc == "gzip" || cenc == "x-gzip" || cenc == "deflate"
    // identity bodies (the common case) decode in place — no byte copy
    if (!chunked && !encoded)
      return head + "\r\n\r\n" +
        CharsetDetect.decode(bytes, bodyOff, end - bodyOff, ctype)
    val raw = java.util.Arrays.copyOfRange(bytes, bodyOff, end)
    val framed =
      if (chunked) try dechunk(raw) catch { case _: Throwable => raw }
      else raw
    val body = cenc match {
      case "gzip" | "x-gzip" =>
        try gunzipAll(framed) catch { case _: Throwable => framed }
      case "deflate" => try inflateDeflate(framed)
        catch { case _: Throwable => framed }
      case _ => framed
    }
    head + "\r\n\r\n" + CharsetDetect.decode(body, 0, body.length, ctype)
  }

  /** Remove RFC 9112 §7.1 chunked framing: `hex-size[;ext] CRLF data
    * CRLF`* then `0 CRLF trailer* CRLF`. Throws on malformed framing
    * (caller falls back to the raw bytes). */
  private[ext] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    var p = 0
    def line(): String = {
      val s = p
      while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
      require(p + 1 < b.length, "http: chunk line never ends")
      val l = new String(b, s, p - s, java.nio.charset.StandardCharsets.ISO_8859_1)
      p += 2; l
    }
    var done = false
    while (!done) {
      val sizeLine = line()
      val semi = sizeLine.indexOf(';') // chunk extensions are legal; drop
      val hex = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      val n = java.lang.Long.parseLong(hex, 16)
      require(n >= 0 && n <= b.length - p, s"http: chunk size $n out of range")
      if (n == 0) {
        // trailer section: header lines until the terminating blank line
        var t = line(); while (t.nonEmpty) t = line()
        done = true
      } else {
        out.write(b, p, n.toInt); p += n.toInt
        require(p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n',
          "http: chunk data not CRLF-terminated")
        p += 2
      }
    }
    out.toByteArray
  }

  /** `Content-Encoding: deflate` is zlib-wrapped by RFC 9110, but many
    * real servers send RAW deflate — try zlib first, retry raw. */
  private[ext] def inflateDeflate(b: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      try {
        val in = new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(b), inf, 64 * 1024)
        val out = new ByteArrayOutputStream(b.length * 4)
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally inf.end()
    }
    try run(nowrap = false)
    catch { case _: java.io.IOException => run(nowrap = true) }
  }

  /** Fixture synthesis: wrap `documents` into WET files of
    * `docsPerFile` consecutive ids (file_id = doc_id / docsPerFile),
    * optionally gzipped one member per RECORD (the Common Crawl
    * layout). Output: (file_id, blob). */
  def synthesizeWet(spark: SparkSession, docs: DataFrame, idCol: String,
                    textCol: String, docsPerFile: Int,
                    gzipped: Boolean = false): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .groupByKey(_._1 / docsPerFile)
      .mapGroups { (fileId, it) =>
        val ds = it.toSeq.sortBy(_._1)
        val blob = if (gzipped)
          gzipPerRecord(warcinfoRecord(fileId) +:
            ds.map { case (id, t) => conversionRecord(id, t) })
        else buildWetFile(fileId, ds)
        (fileId, blob)
      }
      .toDF("file_id", "blob")
  }

  /** All records of all files — one typed map-side pass, blob never
    * shuffled (production: feed `binaryFile` rows in here). */
  def records(spark: SparkSession, files: DataFrame, fileIdCol: String,
              blobCol: String): Dataset[WarcRecordRow] = {
    import spark.implicits._
    files.select(col(fileIdCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (fid, blob) => recordStream(fid, blob) })
  }

  /** The WET text extraction a corpus build starts from: conversion
    * records → (doc_id parsed from the target URI, text). */
  def wetDocs(spark: SparkSession, files: DataFrame, fileIdCol: String,
              blobCol: String): DataFrame =
    records(spark, files, fileIdCol, blobCol)
      .where(col("warc_type") === "conversion")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("text"), col("content_length"))

  // ------------------------------------------------------------------
  // Raw `response` records (.warc.gz) — HTML captures, not extracted
  // text: the form Common Crawl's primary output actually takes. The
  // block is an HTTP/1.1 message (status line + headers + CRLF CRLF +
  // HTML body); extraction = split the HTTP head, then
  // [[HtmlExtract.extract]] on the body. Same file-level parallelism
  // and single-scan discipline as the WET path.
  // ------------------------------------------------------------------

  private val HttpHead =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Server: graft-fixture\r\n\r\n"

  /** Minimal HTML escaping for planting corpus text inside the fixture
    * markup (identity on the alphanumeric word-soup corpus — the
    * planted-entity line is what proves the decoder; this keeps the
    * synthesis correct for ANY text). */
  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The entity exemplar tail every fixture page plants (one exemplar
    * per decode rule family), and its decoded form — interpolated into
    * the oracle so the hash gate proves named/decimal/hex entity
    * decoding and the `<br/>` line-break rule. */
  val HtmlEntityLineMarkup: String =
    "amp=&amp; lt=&lt; gt=&gt; quot=&quot; apos=&#39; dec=&#65; " +
      "hex=&#x42;<br/>nbsp=&nbsp;end"
  val HtmlEntityLineText: String =
    "amp=& lt=< gt=> quot=\" apos=' dec=A hex=B\nnbsp=\u00A0end"

  /** Deterministic fixture page for (docId, text): real-world noise on
    * every extraction rule — raw-text drops (title/style/script with
    * planted fake tags inside), a comment, attribute values containing
    * `>`, mixed-case tags, an inline `<b>` splitting the first word
    * (must vanish without inserting whitespace), padding whitespace
    * (must collapse), and the entity exemplar line. Extraction
    * recovers exactly: `planted-title-{id}\n{text}\n{entity line}`. */
  def synthesizeHtml(docId: Long, text: String): String =
    synthesizeHtmlPage(docId, text, """<meta charset="utf-8"/>""", None)

  /** The general page builder: `metaLine` is the (possibly empty) meta
    * tag planted in the head, `exemplar` an optional extra paragraph —
    * the charset fixture plants a per-encoding non-ASCII exemplar
    * there, so extraction gains one `charset-exemplar: ...` line. */
  private def synthesizeHtmlPage(docId: Long, text: String,
      metaLine: String, exemplar: Option[String]): String = {
    val esc = escapeHtml(text)
    val sp = esc.indexOf(' ')
    val (bold, rest) = if (sp < 0) (esc, "") else esc.splitAt(sp)
    val exLine = exemplar
      .map(e => s"<p>charset-exemplar: ${escapeHtml(e)}</p>\n").getOrElse("")
    s"""<!DOCTYPE html>
       |<HTML lang="en"><head>
       |<title>t-$docId not body text</title>
       |$metaLine
       |<style type="text/css">p { color: red; } /* <p>style noise</p> */</style>
       |<script>var s = "<p>script noise $docId</p>"; if (1 < 2) { }</script>
       |</head>
       |<body>
       |<!-- comment <p>noise</p> $docId -->
       |<h1 class="t" data-x="a>b">planted-title-$docId</h1>
       |<div id="main"><p>  <b>$bold</b>$rest  </p></div>
       |<p>$HtmlEntityLineMarkup</p>
       |$exLine<script type="text/javascript">console.log("$docId");</script>
       |</body></HTML>""".stripMargin
  }

  def responseRecord(docId: Long, html: String): Array[Byte] = record(Seq(
    "WARC-Type" -> "response",
    "WARC-Target-URI" -> targetUri(docId),
    "WARC-Record-ID" -> s"<urn:graft:doc:$docId>",
    "WARC-Date" -> FixtureDate,
    "Content-Type" -> "application/http; msgtype=response"),
    (HttpHead + html).getBytes(UTF_8))

  // ------------------------------------------------------------------
  // Wire-encoded response bodies: real captures store the body AS
  // RECEIVED — Content-Encoding (gzip/deflate) and Transfer-Encoding
  // (chunked) still applied. The fixture plants one case per decode
  // rule (doc_id % 5): identity, gzip, zlib deflate, chunked (with a
  // chunk extension and a trailer header — both legal noise the parser
  // must skip), and gzip-then-chunked (the layering real servers
  // produce: entity encoded first, chunking outermost).
  // ------------------------------------------------------------------

  val HttpEncodingNumCases = 5

  /** zlib-wrapped deflate (the RFC 9110 `deflate` meaning). */
  private def zlibDeflate(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    d.write(bytes); d.close(); bos.toByteArray
  }

  /** Apply RFC 9112 chunked framing in `chunkSize` pieces; the first
    * chunk carries a chunk extension and the terminator a trailer
    * header — legal wire noise the decoder must tolerate. */
  private def chunkEncode(bytes: Array[Byte], chunkSize: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length + 64)
    var p = 0; var first = true
    while (p < bytes.length) {
      val n = math.min(chunkSize, bytes.length - p)
      val ext = if (first) ";graft=fixture" else ""
      bos.write(s"${n.toHexString}$ext\r\n".getBytes(UTF_8))
      bos.write(bytes, p, n)
      bos.write("\r\n".getBytes(UTF_8))
      p += n; first = false
    }
    bos.write("0\r\nX-Graft-Trailer: end\r\n\r\n".getBytes(UTF_8))
    bos.toByteArray
  }

  /** A `response` record whose HTTP body is wire-encoded per
    * doc_id % 5 — the fixture behind `warc_html_extract_encoded`. */
  def responseRecordEncoded(docId: Long, html: String): Array[Byte] = {
    val plain = html.getBytes(UTF_8)
    val (extraHeaders, body) = (docId % HttpEncodingNumCases).toInt match {
      case 0 => ("", plain)
      case 1 => ("Content-Encoding: gzip\r\n", gzip(plain))
      case 2 => ("Content-Encoding: deflate\r\n", zlibDeflate(plain))
      case 3 => ("Transfer-Encoding: chunked\r\n", chunkEncode(plain, 113))
      case _ => ("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
        chunkEncode(gzip(plain), 113))
    }
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Server: graft-fixture\r\n$extraHeaders\r\n").getBytes(UTF_8)
    val block = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, block, 0, head.length)
    System.arraycopy(body, 0, block, head.length, body.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> targetUri(docId),
      "WARC-Record-ID" -> s"<urn:graft:doc:$docId>",
      "WARC-Date" -> FixtureDate,
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  /** The shared shape of every record-level WARC fixture synthesis:
    * group `docsPerFile` consecutive ids per file, warcinfo first, one
    * record per doc in id order via `recordFn`, gzip one member per
    * record when `gzipped` (the Common Crawl layout) else raw
    * concatenation — the three public variants differ ONLY in the
    * record function, so a grouping/gzip fix lands once. */
  private def synthesizeRecords(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, docsPerFile: Int, gzipped: Boolean)(
      recordFn: (Long, String) => Array[Byte]): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .groupByKey(_._1 / docsPerFile)
      .mapGroups { (fileId, it) =>
        val recs = warcinfoRecord(fileId) +: it.toSeq.sortBy(_._1)
          .map { case (id, t) => recordFn(id, t) }
        val blob = if (gzipped) gzipPerRecord(recs)
        else {
          val bos = new ByteArrayOutputStream(); recs.foreach(bos.write)
          bos.toByteArray
        }
        (fileId, blob)
      }
      .toDF("file_id", "blob")
  }

  /** [[synthesizeWarc]] with wire-encoded bodies; `gzipped` = one gzip
    * member per record (the CC layout — off by default, like the other
    * synthesis variants). */
  def synthesizeWarcEncoded(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, docsPerFile: Int,
      gzipped: Boolean = false): DataFrame =
    synthesizeRecords(spark, docs, idCol, textCol, docsPerFile, gzipped)(
      (id, t) => responseRecordEncoded(id, synthesizeHtml(id, t)))

  /** Fixture synthesis for the raw-capture path: wrap `documents` into
    * WARC files of `response` records (same docsPerFile grouping as
    * [[synthesizeWet]]); `gzipped` = one gzip member per record (the
    * Common Crawl `.warc.gz` layout). */
  def synthesizeWarc(spark: SparkSession, docs: DataFrame, idCol: String,
                     textCol: String, docsPerFile: Int,
                     gzipped: Boolean = false): DataFrame =
    synthesizeRecords(spark, docs, idCol, textCol, docsPerFile, gzipped)(
      (id, t) => responseRecord(id, synthesizeHtml(id, t)))

  // ------------------------------------------------------------------
  // Charset fixture: the same page planted under 7 encodings, one per
  // resolution rule of [[CharsetDetect]] — doc_id % 7 picks the case.
  // Each case appends a charset-specific non-ASCII exemplar line (the
  // corpus soup is ASCII, where every ASCII-compatible charset is
  // byte-identical and would prove nothing).
  // ------------------------------------------------------------------

  /** (http Content-Type, meta line, encoder charset name, BOM) per
    * case; exemplars in [[CharsetExemplars]] (index-aligned). Cases:
    * 0 charset in Content-Type; 1 UTF-16LE BOM *overriding* a wrong
    * Content-Type; 2 UTF-16BE BOM, nothing declared; 3 `<meta charset>`
    * only; 4 Content-Type GBK (legacy CJK); 5 http-equiv meta
    * windows-1252 (the euro exemplar separates it from latin-1);
    * 6 nothing declared, non-UTF-8 bytes -> latin-1 fallback. */
  private val CharsetCases: IndexedSeq[(String, String, String, Array[Byte])] =
    IndexedSeq(
      ("text/html; charset=utf-8", """<meta charset="utf-8"/>""",
        "UTF-8", Array.emptyByteArray),
      ("text/html; charset=iso-8859-1", "",
        "UTF-16LE", Array(0xff.toByte, 0xfe.toByte)),
      ("text/html", "",
        "UTF-16BE", Array(0xfe.toByte, 0xff.toByte)),
      ("text/html", """<meta charset="iso-8859-1"/>""",
        "ISO-8859-1", Array.emptyByteArray),
      ("text/html; charset=gbk", """<meta charset="gbk"/>""",
        "GBK", Array.emptyByteArray),
      ("text/html",
        """<meta http-equiv="Content-Type" content="text/html; charset=windows-1252"/>""",
        "windows-1252", Array.emptyByteArray),
      ("text/html", "", "ISO-8859-1", Array.emptyByteArray))

  /** Per-case exemplar text, each encodable in its case's charset and
    * non-ASCII enough to prove the decode (e-acute/CJK/euro/...).
    * Interpolated into the `warc_charset_extract` oracle. Unicode
    * escapes keep the source file encoding-independent (the build runs
    * under a POSIX locale where scalac reads platform charset). */
  val CharsetExemplars: IndexedSeq[String] = IndexedSeq(
    "caf\u00e9 \u4e2d\u6587 \u00df\u20ac\u00b5 utf-8",
    "\u4e2d\u6587 caf\u00e9 \u2603 utf-16le-bom",
    "\u00e9\u00e8\u00ea \u4e16\u754c utf-16be-bom",
    "caf\u00e9 \u00b1\u00b5\u00bd latin-1-meta",
    "\u4e2d\u6587\u7f16\u7801\u6d4b\u8bd5 gbk",
    "caf\u00e9 \u20ac\u2122\u201cquoted\u201d cp1252",
    "na\u00efve caf\u00e9 \u00bc\u00bd\u00be fallback")

  val CharsetNumCases: Int = CharsetCases.length

  /** A `response` record whose HTTP body is the fixture page encoded
    * per the doc's charset case (BOM prepended where the case has one).
    * The HTTP head stays ASCII — only the body re-encodes, exactly how
    * real captures frame legacy payloads. */
  def responseRecordCharset(docId: Long, text: String): Array[Byte] = {
    val i = (docId % CharsetNumCases).toInt
    val (ctype, metaLine, csName, bom) = CharsetCases(i)
    val html = synthesizeHtmlPage(docId, text, metaLine,
      Some(CharsetExemplars(i)))
    val head = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
      "Server: graft-fixture\r\n\r\n").getBytes(UTF_8)
    val body = html.getBytes(java.nio.charset.Charset.forName(csName))
    val block = new Array[Byte](head.length + bom.length + body.length)
    System.arraycopy(head, 0, block, 0, head.length)
    System.arraycopy(bom, 0, block, head.length, bom.length)
    System.arraycopy(body, 0, block, head.length + bom.length, body.length)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> targetUri(docId),
      "WARC-Record-ID" -> s"<urn:graft:doc:$docId>",
      "WARC-Date" -> FixtureDate,
      "Content-Type" -> "application/http; msgtype=response"), block)
  }

  /** [[synthesizeWarc]] with per-doc charset cases — the fixture behind
    * `warc_charset_extract`. */
  def synthesizeWarcCharset(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, docsPerFile: Int,
      gzipped: Boolean = false): DataFrame =
    synthesizeRecords(spark, docs, idCol, textCol, docsPerFile, gzipped)(
      responseRecordCharset)

  /** Body of an HTTP response message (the block of a WARC `response`
    * record): everything past the first blank line. Fails loudly on a
    * non-HTTP block ([[parseRecords]]' corrupt-segment discipline). */
  def httpBody(block: String): String = {
    require(block.startsWith("HTTP/"),
      s"warc: response block is not HTTP (starts '${block.take(12)}')")
    val cut = block.indexOf("\r\n\r\n")
    require(cut >= 0, "warc: HTTP head never ends (no CRLFCRLF)")
    block.substring(cut + 4)
  }

  /** The crawl-ingest extraction a 100 TB corpus build starts from:
    * `response` records → HTTP body → [[HtmlExtract.extract]] →
    * (doc_id parsed from the target URI, text). One typed map-side
    * pass; the blob never shuffles. */
  def htmlDocs(spark: SparkSession, files: DataFrame, fileIdCol: String,
               blobCol: String): DataFrame = {
    import spark.implicits._
    records(spark, files, fileIdCol, blobCol)
      .filter(col("warc_type") === "response")
      .map(r => (
        r.target_uri.replaceAll("^.*/doc/(\\d+)$", "$1").toLong,
        HtmlExtract.extract(httpBody(r.text))))
      .toDF("doc_id", "text")
  }
}
