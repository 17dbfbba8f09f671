package graft.stream

import graft.SparkSpecBase
import graft.cdc.{CdcFormat, SchemaInference, SyncTable}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** StreamBench workload semantics: the throughput row must measure a
  * pipeline whose delete path is actually alive. Regression for the
  * delete-free warm batch: the warm batch runs at b = -1 (negative
  * seq), where a signed `% 12 == 11` op selector never picks "d" —
  * under the production `Mode.Cached` the warm batch then caches
  * `before` as StringType (nulls-only inference) and every delete in
  * the timed batches normalizes to a null-key row, so the recorded
  * events/s times a pipeline that silently never deletes. */
class StreamBenchSpec extends SparkSpecBase {

  private val keyspace = 250L

  test("warm batch (negative seq) contains all three ops") {
    val warm = StreamBench.genBatch(-1L, 500, keyspace)
    assert(warm.exists(_.contains("\"op\":\"d\"")),
      "warm batch must contain deletes so Mode.Cached infers `before` as a struct")
    assert(warm.exists(_.contains("\"op\":\"c\"")))
    assert(warm.exists(_.contains("\"op\":\"u\"")))
  }

  test("mini bench run under Mode.Cached applies every timed delete") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._
    val t0 = SyncTable("sb_db", "t0", "id")
    val t1 = SyncTable("sb_db", "t1", "id")
    val cfg = CdcPipelineConfig(
      format = CdcFormat.MskDebeziumCdc,
      tables = Seq(t0, t1),
      sinkRoot = Files.createTempDirectory("graft-sbench-spec").toString,
      checkpointDir = Files.createTempDirectory("graft-sbench-spec-ckpt").toString,
      triggerInterval = "1 second",
      schemaMode = SchemaInference.Mode.Cached) // same mode StreamBench times

    // Same shape as StreamBench.run: one warm batch at b = -1, then
    // timed batches b = 0,1 — seqs -500..-1 then 0..999.
    val input = MemoryStream[String]
    val p = new CdcPipeline(spark, cfg)
    val q = p.start(input.toDF())
    try {
      input.addData(StreamBench.genBatch(-1L, 500, keyspace): _*)
      q.processAllAvailable()
      for (b <- 0 until 2) {
        input.addData(StreamBench.genBatch(b.toLong, 500, keyspace): _*)
        q.processAllAvailable()
      }

      // Expected final state replicated from genBatch's formula: per id
      // the max-seq event wins (ts = seq, strictly increasing); a
      // winning delete means the key is absent from the sink.
      def opOf(seq: Long): String =
        if (math.floorMod(seq, 12) == 11) "d"
        else if (math.floorMod(seq, 3) == 0) "u" else "c"
      val lastSeq = ((-500L until 0L) ++ (0L until 1000L))
        .map(seq => math.floorMod(seq * 2654435761L, keyspace) -> seq)
        .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).max }
      assert(lastSeq.exists { case (_, seq) => opOf(seq) == "d" },
        "workload must end at least one key on a delete for this test to bite")
      val expected = lastSeq.collect {
        case (id, seq) if opOf(seq) != "d" => id -> s"v$seq"
      }

      def sinkState(table: SyncTable): Map[Long, String] =
        p.sinks(table.id).read().map(_.collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap)
          .getOrElse(Map.empty)
      assert(sinkState(t0) === expected.filter(_._1 % 2 == 0))
      assert(sinkState(t1) === expected.filter(_._1 % 2 == 1))
    } finally { q.stop(); p.shutdown() }
  }
}
