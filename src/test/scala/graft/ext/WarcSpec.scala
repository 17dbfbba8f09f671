package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("WET round-trip: corpus -> WARC/1.0 files -> parse -> corpus") {
    val d = df(0L -> "alpha beta", 1L -> "gamma", 49L -> "delta eps",
      50L -> "next file", 120L -> "third file")
    val files = Warc.synthesizeWet(spark, d, "doc_id", "text", 50)
    assert(files.count() === 3, "ids 0..49 / 50 / 120 -> 3 files")
    val back = Warc.wetDocs(spark, files, "file_id", "blob")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(back.toSeq === Seq((0L, "alpha beta", 10L), (1L, "gamma", 5L),
      (49L, "delta eps", 9L), (50L, "next file", 9L), (120L, "third file", 10L)))
  }

  test("gz layout: one gzip member per record, multi-member inflate") {
    val d = df(0L -> "a a a", 1L -> "b b", 7L -> "c")
    val files = Warc.synthesizeWet(spark, d, "doc_id", "text", 50, gzipped = true)
    val blob = files.collect()(0).getAs[Array[Byte]]("blob")
    // the blob must really be multi-member: a second gzip magic beyond
    // offset 0 proves per-record members, not one stream
    val magics = (1 until blob.length - 1).count(i =>
      (blob(i) & 0xff) == 0x1f && (blob(i + 1) & 0xff) == 0x8b)
    assert(magics >= 3, s"expected >=3 extra gzip members, found $magics")
    val back = Warc.wetDocs(spark, files, "file_id", "blob")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((0L, "a a a"), (1L, "b b"), (7L, "c")))
  }

  test("content-length is octets: multi-byte UTF-8 survives byte-exactly") {
    val d = df(3L -> "café 中文 naïve")
    val files = Warc.synthesizeWet(spark, d, "doc_id", "text", 50)
    val r = Warc.wetDocs(spark, files, "file_id", "blob").collect()(0)
    assert(r.getString(1) === "café 中文 naïve")
    assert(r.getLong(2) ===
      "café 中文 naïve".getBytes("UTF-8").length.toLong)
  }

  test("unknown headers and arbitrary order are tolerated; warcinfo parsed") {
    val block = "hello world".getBytes("UTF-8")
    val rec = (s"WARC/1.0\r\nX-Custom: junk\r\nContent-Type: text/plain\r\n" +
      s"WARC-Target-URI: https://example.com/doc/9\r\nWARC-Type: conversion\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8") ++
      block ++ "\r\n\r\n".getBytes("UTF-8")
    val rows = Warc.parseRecords(5L, rec)
    assert(rows.length === 1)
    assert(rows(0).warc_type === "conversion" && rows(0).text === "hello world")
    val info = Warc.parseRecords(1L, Warc.warcinfoRecord(1L))
    assert(info(0).warc_type === "warcinfo" &&
      info(0).text === Warc.WarcinfoBlock)
  }

  test("corrupt segments fail loudly, never silently truncate") {
    val good = Warc.conversionRecord(1L, "some text here")
    // truncated mid-block
    intercept[IllegalArgumentException] {
      Warc.parseRecords(0L, good.dropRight(6))
    }
    // framing terminator overwritten
    val bad = good.clone(); bad(good.length - 1) = 'X'
    intercept[IllegalArgumentException] { Warc.parseRecords(0L, bad) }
    // wrong magic
    intercept[IllegalArgumentException] {
      Warc.parseRecords(0L, "HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
    }
  }

  test("response records round-trip: HTML capture -> extract -> expected text") {
    val d = df(0L -> "alpha beta gamma", 55L -> "delta", 120L -> "eps zeta")
    for (gz <- Seq(false, true)) {
      val files = Warc.synthesizeWarc(spark, d, "doc_id", "text", 50, gzipped = gz)
      assert(files.count() === 3)
      val back = Warc.htmlDocs(spark, files, "file_id", "blob")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      val want = Seq(0L -> "alpha beta gamma", 55L -> "delta", 120L -> "eps zeta")
        .map { case (id, t) =>
          (id, s"planted-title-$id\n$t\n${Warc.HtmlEntityLineText}")
        }
      assert(back.toSeq === want, s"gz=$gz")
    }
  }

  test("a non-HTTP response block fails loudly (corrupt-segment discipline)") {
    intercept[IllegalArgumentException] { Warc.httpBody("not http at all") }
    intercept[IllegalArgumentException] { Warc.httpBody("HTTP/1.1 200 OK\r\nno blank line") }
    assert(Warc.httpBody("HTTP/1.1 200 OK\r\nA: b\r\n\r\n<p>x</p>") === "<p>x</p>")
  }

  test("a zstd-compressed WET blob parses through the same record stream") {
    val raw = Warc.buildWetFile(3L, Seq(1L -> "alpha", 2L -> "beta"))
    val rows = Warc.parseRecords(3L, Warc.zstd(raw))
    assert(rows.map(_.warc_type) === Seq("warcinfo", "conversion", "conversion"))
    assert(rows.filter(_.warc_type == "conversion").map(_.text) ===
      Seq("alpha", "beta"))
  }

  test("record stream is lazy: earlier records served before a corrupt tail") {
    val good = Warc.conversionRecord(1L, "first record") ++
      Warc.conversionRecord(2L, "second record") ++
      Warc.conversionRecord(3L, "third record")
    val bad = good.clone()
    bad(bad.length - 1) = 'X' // corrupt the LAST record's terminator
    val it = Warc.recordStream(0L, bad)
    assert(it.next().text === "first record") // prefetched record 2 only
    val e = intercept[IllegalArgumentException] { it.next(); it.next() }
    assert(e.getMessage.contains("terminator"))
  }

  test("a multi-megabyte multi-member gz shard streams record-at-a-time") {
    // ~8 MB inflated across 400 per-record gzip members (the Common
    // Crawl layout): the streaming reader never builds the inflated
    // whole-file copy the old parse materialized.
    val text = "w" * 20000
    val recs = (0L until 400L).map(i => Warc.conversionRecord(i, text))
    val blob = Warc.gzipPerRecord(recs)
    var n = 0
    val it = Warc.recordStream(7L, blob)
    while (it.hasNext) {
      val r = it.next()
      assert(r.file_id === 7L && r.text.length === 20000)
      n += 1
    }
    assert(n === 400)
  }

  test("dechunk: sizes in hex, extensions and trailers skipped, malformed throws") {
    val body = ("5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\n" +
      "X-Trailer: v\r\n\r\n").getBytes("UTF-8")
    assert(new String(Warc.dechunk(body), "UTF-8") === "hello world")
    // size larger than remaining bytes
    intercept[IllegalArgumentException] {
      Warc.dechunk("ff\r\nshort\r\n0\r\n\r\n".getBytes("UTF-8"))
    }
    // data not CRLF-terminated
    intercept[IllegalArgumentException] {
      Warc.dechunk("5\r\nhelloXX0\r\n\r\n".getBytes("UTF-8"))
    }
  }

  test("inflateDeflate: zlib-wrapped and raw deflate both inflate") {
    val plain = "deflate me please, twice over".getBytes("UTF-8")
    val zlib = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos)
      d.write(plain); d.close(); bos.toByteArray
    }
    val raw = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos,
        new java.util.zip.Deflater(-1, true))
      d.write(plain); d.close(); bos.toByteArray
    }
    assert(Warc.inflateDeflate(zlib).toSeq === plain.toSeq)
    assert(Warc.inflateDeflate(raw).toSeq === plain.toSeq)
  }

  test("wire-encoded responses: gzip/deflate/chunked/gzip+chunked all extract") {
    // ids 0..4 cover exactly the 5 encoding cases (doc_id % 5)
    val d = df(0L -> "plain body", 1L -> "gzip body", 2L -> "deflate body",
      3L -> "chunked body", 4L -> "gzip chunked body")
    for (gz <- Seq(false, true)) {
      val files = Warc.synthesizeWarcEncoded(spark, d, "doc_id", "text", 50,
        gzipped = gz)
      val back = Warc.htmlDocs(spark, files, "file_id", "blob")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      val want = (0L to 4L).zip(Seq("plain body", "gzip body", "deflate body",
        "chunked body", "gzip chunked body")).map { case (id, t) =>
        (id, s"planted-title-$id\n$t\n${Warc.HtmlEntityLineText}")
      }
      assert(back.toSeq === want, s"gz=$gz")
    }
  }

  test("corrupt body encoding fails SOFT to raw bytes, not a dead shard") {
    // claims gzip but the body is not: decode must fall back, and the
    // record (plus its neighbors) still parse
    val head = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Content-Encoding: gzip\r\n\r\n"
    val block = (head + "<body><p>not actually gzip</p></body>").getBytes("UTF-8")
    val rec = {
      val b = new java.io.ByteArrayOutputStream()
      b.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: ${Warc.targetUri(9L)}\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8"))
      b.write(block); b.write("\r\n\r\n".getBytes("UTF-8"))
      b.toByteArray
    }
    val rows = Warc.parseRecords(0L, rec)
    assert(rows.length === 1)
    assert(rows(0).text.contains("not actually gzip"))
  }

  test("parse is map-side: no shuffle, blob never crosses an exchange") {
    val d = df((0L until 20L).map(i => i -> s"doc $i text"): _*)
    val dir = java.nio.file.Files.createTempDirectory("warc_plan").toString
    // materialize files first (as a binaryFile-style source would) so
    // the asserted plan is parse-only, like production ingest
    Warc.synthesizeWet(spark, d, "doc_id", "text", 5)
      .write.mode("overwrite").parquet(dir)
    val files = spark.read.parquet(dir)
    val p = Warc.wetDocs(spark, files, "file_id", "blob")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"WET parse should not shuffle:\n$p")
  }
}
