package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("charChunks: window/stride boundaries, short tail, empty doc skipped") {
    val d = df(1L -> "abcdefghij", 2L -> "")
    val got = Chunker.charChunks(d, "doc_id", "text", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // len 10, starts 1,4,7,10 → chunks abcd/defg/ghij/j; doc 2 gone
    assert(got.toSeq === Seq(
      (1L, 0L, 1L, "abcd", 4L),
      (1L, 1L, 4L, "defg", 4L),
      (1L, 2L, 7L, "ghij", 4L),
      (1L, 3L, 10L, "j", 1L)))
  }

  test("charChunks: overlap reconstructs the document (stride strips the overlap)") {
    val text = "the quick brown fox jumps over the lazy dog"
    val d = df(7L -> text)
    val chunks = Chunker.charChunks(d, "doc_id", "text", window = 12, stride = 8)
      .orderBy("chunk_id").collect()
    // concatenating each chunk's first `stride` chars re-yields the text
    val rebuilt = chunks.map(_.getString(3).take(8)).mkString
    assert(rebuilt === text)
  }

  test("tokenChunks: whitespace runs collapse, single-space rejoin, tail window") {
    val d = df(1L -> "  a\tb \n c d e  ", 2L -> " \t ")
    val got = Chunker.tokenChunks(d, "doc_id", "text", window = 2, stride = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // 5 tokens, starts 1,3,5 → ab/cd/e; whitespace-only doc 2 skipped
    assert(got.toSeq === Seq(
      (1L, 0L, 1L, "a b", 2L),
      (1L, 1L, 3L, "c d", 2L),
      (1L, 2L, 5L, "e", 1L)))
  }

  test("tokenChunks: overlapping windows share the overlap tokens exactly") {
    val d = df(1L -> "t0 t1 t2 t3 t4 t5 t6")
    val got = Chunker.tokenChunks(d, "doc_id", "text", window = 4, stride = 2)
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(got.toSeq === Seq("t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6", "t6"))
  }

  test("stats: per-doc roll-up matches hand counts") {
    val d = df(1L -> "a b c d e", 2L -> "x")
    val chunks = Chunker.tokenChunks(d, "doc_id", "text", window = 3, stride = 2)
    val got = Chunker.stats(chunks, "doc_id", "n_chunk_tokens")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: starts 1,3,5 → sizes 3,3,1; doc 2: one size-1 chunk
    assert(got.toSeq === Seq((1L, 3L, 7L, 1L, 3L), (2L, 1L, 1L, 1L, 1L)))
  }

  test("plan shape: chunking is a pure projection — no shuffle below the explode") {
    val d = df(1L -> "a b c")
    val plan = Chunker.tokenChunks(d, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
