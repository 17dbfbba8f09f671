package graft.stream

import graft.SparkSpecBase
import graft.ext.KMeans

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** Streaming k-means assignment e2e: micro-batch assignments equal the
  * batch operator under the same persisted model, and a replayed epoch
  * overwrites itself byte-identically. */
class StreamKMeansSpec extends SparkSpecBase {

  test("stream assignments equal batch assign; epoch replay is idempotent") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      s.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import s.implicits._

    // model trained on a small base corpus around two centers
    val base = (0L until 20L).map { i =>
      val c = if (i % 2 == 0) 1f else -1f
      (i, Seq(c, c * 0.5f, 0.1f * (i % 3)))
    }
    val (model, _) = KMeans.train(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, iters = 3)
    val modelDir = Files.createTempDirectory("skm-model").toString
    KMeans.writeModel(spark, model, modelDir)
    // persistence round-trips the centroids exactly
    assert(KMeans.loadModel(spark, modelDir).centroids.map(_.toSeq).toSeq ===
      model.centroids.map(_.toSeq).toSeq)

    val out = Files.createTempDirectory("skm-out").toString
    val ckpt = Files.createTempDirectory("skm-ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamKMeans.start(input.toDF().toDF("vec_id", "embedding"),
      modelDir, out, ckpt)
    val shard1 = Seq((100L, Seq(0.9f, 0.4f, 0f)), (101L, Seq(-0.8f, -0.5f, 0f)))
    val shard2 = Seq((102L, Seq(1.1f, 0.6f, 0.2f)))
    try {
      input.addData(shard1: _*); q.processAllAvailable()
      input.addData(shard2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = KMeans.assign(
        KMeans.quantize((shard1 ++ shard2).toDF("vec_id", "embedding"),
          "vec_id", "embedding"),
        "vec_id", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === direct,
      "streamed assignments must equal the batch operator's")

    // replayed epoch b1 (shard2): re-running the body overwrites the
    // partition with identical rows
    KMeans.assign(KMeans.quantize(shard2.toDF("vec_id", "embedding"),
        "vec_id", "embedding"), "vec_id", model)
      .write.mode("overwrite").parquet(s"$out/__epoch=b1")
    val replayed = spark.read.parquet(out)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed === direct)
  }
}
