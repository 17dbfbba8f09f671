package graft.stream

import graft.SparkSpecBase
import graft.cdc.{CdcFormat, SchemaInference, SyncTable}
import graft.sink.EdgeProbe

import java.nio.file.Files

/** The cluster-day swap rehearsal: the SAME pipeline runs behind any
  * edge pair. Offline this proves (a) the file edge end-to-end through
  * route/normalize/merge, (b) the connector edges fail fast with
  * actionable messages when their jars are absent, and (c) the
  * Hudi/Kafka happy paths are `assume`-guarded so the identical suite
  * smoke-tests them the moment the jars appear on a cluster. */
class EdgesSpec extends SparkSpecBase {

  private val acct = SyncTable("edge_db", "acct", "id")

  private def ev(id: Int, v: String, ts: Long): String =
    s"""{"before":null,"after":{"id":$id,"v":"$v"},"source":{"db":"edge_db","table":"acct"},"op":"c","ts_ms":$ts}"""

  test("file-source edge drives the full pipeline e2e (readStream text -> normalize -> merge)") {
    val src = Files.createTempDirectory("graft-edge-src")
    val root = Files.createTempDirectory("graft-edge-sink").toString
    val ckpt = Files.createTempDirectory("graft-edge-ckpt").toString
    Files.write(src.resolve("batch0.json"),
      (Seq(ev(1, "a1", 100), ev(2, "b1", 100), ev(1, "a2", 200)).mkString("\n") + "\n").getBytes)

    val cfg = EdgeConfig(source = "file", sink = "bucketed",
      sourcePath = Some(src.toString), nBuckets = 4)
    val pcfg = CdcPipelineConfig(
      format = CdcFormat.MskDebeziumCdc,
      tables = Seq(acct),
      sinkRoot = root, checkpointDir = ckpt,
      triggerInterval = "1 second",
      schemaMode = SchemaInference.Mode.InferAlways,
      sinkFactory = Some(Edges.sinkFactory(spark, cfg)))
    val p = new CdcPipeline(spark, pcfg)
    val q = p.start(Edges.source(spark, cfg))
    try {
      q.processAllAvailable()
      val state = p.sinks(acct.id).read().get.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(state === Map(1L -> "a2", 2L -> "b1"))
      // the bucketed edge really was selected (manifest layout on disk)
      assert(new java.io.File(s"$root/edge_db/acct").listFiles()
        .exists(_.getName.matches("_current\\.v\\d+")))
    } finally { q.stop(); p.shutdown() }
  }

  test("mor-sink edge drives the full pipeline e2e incl. a delta commit") {
    val src = Files.createTempDirectory("graft-mor-src")
    val root = Files.createTempDirectory("graft-mor-sink").toString
    val ckpt = Files.createTempDirectory("graft-mor-ckpt").toString
    Files.write(src.resolve("batch0.json"),
      (Seq(ev(1, "a1", 100), ev(2, "b1", 100)).mkString("\n") + "\n").getBytes)

    val cfg = EdgeConfig(source = "file", sink = "mor",
      sourcePath = Some(src.toString), nBuckets = 4)
    val pcfg = CdcPipelineConfig(
      format = CdcFormat.MskDebeziumCdc,
      tables = Seq(acct),
      sinkRoot = root, checkpointDir = ckpt,
      triggerInterval = "1 second",
      schemaMode = SchemaInference.Mode.InferAlways,
      sinkFactory = Some(Edges.sinkFactory(spark, cfg)))
    val p = new CdcPipeline(spark, pcfg)
    val q = p.start(Edges.source(spark, cfg))
    try {
      q.processAllAvailable()
      // second file = second micro-batch = a DELTA commit on the log
      Files.write(src.resolve("batch1.json"),
        (Seq(ev(1, "a2", 200), ev(3, "c1", 200)).mkString("\n") + "\n").getBytes)
      q.processAllAvailable()
      val state = p.sinks(acct.id).read().get.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(state === Map(1L -> "a2", 2L -> "b1", 3L -> "c1"))
      // the log-structured edge really was selected: commit-1 exists and
      // holds only the second batch's buckets (a delta, not a rewrite)
      val c1 = new java.io.File(s"$root/edge_db/acct/data/commit-1")
      assert(c1.exists(), "no delta commit dir — MOR edge not selected?")
    } finally { q.stop(); p.shutdown() }
  }

  test("kafka edge fails fast with an actionable message when the jar is absent") {
    assume(!EdgeProbe.kafkaAvailable, "kafka jar present — covered by the cluster smoke")
    val e = intercept[IllegalArgumentException] {
      Edges.source(spark, EdgeConfig(source = "kafka",
        brokers = Some("b:9092"), topics = Some("t")))
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
  }

  test("hudi edge fails fast with an actionable message when the jar is absent") {
    assume(!EdgeProbe.hudiAvailable, "hudi jar present — covered by the cluster smoke")
    val e = intercept[IllegalArgumentException] {
      Edges.sinkFactory(spark, EdgeConfig(sink = "hudi"))("/tmp/x", acct, None)
    }
    assert(e.getMessage.contains("hudi"))
  }

  test("kafka edge smoke (cluster only): option-built stream loads") {
    assume(EdgeProbe.kafkaAvailable, "no kafka jar offline — runs on a cluster")
    val df = Edges.source(spark, EdgeConfig(source = "kafka",
      brokers = Some("localhost:9092"), topics = Some("smoke")))
    assert(df.isStreaming && df.columns.toSeq === Seq("value"))
  }

  test("hudi edge smoke (cluster only): sink constructs and exposes the reference option map") {
    assume(EdgeProbe.hudiAvailable, "no hudi jar offline — runs on a cluster")
    val mk = Edges.sinkFactory(spark, EdgeConfig(sink = "hudi"))
    val s = mk("/tmp/hudi-smoke", acct, Some("db.acct"))
      .asInstanceOf[graft.sink.HudiUpsertSink]
    assert(s.writeOptions("hoodie.datasource.write.recordkey.field") === "id")
    assert(s.writeOptions("hoodie.datasource.write.table.type") === "COPY_ON_WRITE")
  }

  test("unknown edges are rejected") {
    intercept[IllegalArgumentException] {
      Edges.source(spark, EdgeConfig(source = "carrier-pigeon"))
    }
    intercept[IllegalArgumentException] {
      Edges.sinkFactory(spark, EdgeConfig(sink = "stone-tablet"))
    }
  }
}
