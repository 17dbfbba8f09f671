package graft

import graft.cdc.LatestPerKey
import graft.ext.{Dedup, Similarity}
import graft.queries.RelationalQueries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression guards: the 100 TB properties claimed in the
  * scaladoc (pushdown, pruning, broadcast dims, map-side partial
  * aggregation, no accidental cartesian products) must be visible in the
  * optimized plans, not just asserted in comments. A refactor that
  * silently loses one of these shapes fails here before it ships. */
class PlanShapeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("q3: filters reach the parquet scans and columns are pruned") {
    val p = plan(RelationalQueries.q3Revenue(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("GreaterThan(l_shipdate"), s"no pushed lineitem filter in:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "customer filter not pushed")
    // pruned lineitem read: no l_quantity/l_tax in the scan schema
    assert(!p.contains("l_tax"), "lineitem scan reads unneeded columns")
  }

  test("q5: dimension joins are broadcast, never shuffled") {
    val p = plan(RelationalQueries.q5LocalRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "expected broadcast dims")
  }

  test("latest-per-key maxBy aggregates map-side (partial_max_by)") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L, 10L)).toDF("k", "id", "ts")
    val p = plan(LatestPerKey.maxBy(df, Seq("k"), Seq(col("ts"))))
    assert(p.contains("partial_max_by"), s"no map-side partial aggregation in:\n$p")
  }

  test("jaccard/minhash never plan a cartesian product") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val pj = plan(Dedup.jaccardPairs(real, "doc_id", "text", n = 3, threshold = 0.5))
    val pm = plan(Dedup.minhashNearDups(real, "doc_id", "text", n = 3))
    val pp = plan(Dedup.jaccardPairsPrefix(real, "doc_id", "text", n = 3,
      threshold = 0.8))
    for ((nm, p) <- Seq("jaccard" -> pj, "minhash" -> pm,
      "jaccard-prefix" -> pp)) {
      assert(!p.contains("CartesianProduct"), s"$nm plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$nm plans a nested-loop join")
    }
  }

  test("MOR read: single multi-path scan folded by one map-side max_by") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan-mor").toString
    val t = new graft.sink.MorUpsertTable(spark, dir, Seq("id"), nBuckets = 4)
    t.upsert(Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("id", "v", "mtime", "_hoodie_is_deleted"))
    t.upsert(Seq((1L, "a2", 2L, false)).toDF("id", "v", "mtime", "_hoodie_is_deleted"))
    val p = plan(t.read().get)
    assert(p.linesIterator.count(_.contains("Scan parquet")) === 1,
      s"MOR read must stay one multi-path scan:\n$p")
    assert(p.contains("partial_max_by"),
      "MOR log fold should partial-aggregate map-side")
  }

  test("incremental dedup: index scans broadcast-filtered, no cartesian") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plan-inc").toString
    graft.ext.IncrementalDedup.writeIndex(
      real.where(col("doc_id") % 10 =!= 0), "doc_id", "text", dir,
      n = 3, maxDf = 50L)
    val p = plan(graft.ext.IncrementalDedup.nearDupPairs(spark, dir,
      real.where(col("doc_id") % 10 === 0), "doc_id", "text", 0.12))
    assert(!p.contains("CartesianProduct"), s"incremental plans a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), "incremental plans a nested loop")
    // the index-side filters ride a broadcast join (map-side), so the
    // stored shingle table is never shuffled on the shingle
    assert(p.contains("BroadcastHashJoin"), "index scan filter should broadcast")
  }

  test("bucketed incremental indexes: probe scans carry partition filters") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val oldDocs = real.where(col("doc_id") % 10 =!= 0)
    val shard = real.where(col("doc_id") % 10 === 0)
    // exact postings index, shingle-bucketed layout
    val exDir = java.nio.file.Files.createTempDirectory("plan-inc-bkt").toString
    graft.ext.IncrementalDedup.writeIndex(oldDocs, "doc_id", "text", exDir,
      n = 3, maxDf = 50L, shingleBuckets = 16)
    val pe = plan(graft.ext.IncrementalDedup.nearDupPairs(spark, exDir,
      shard, "doc_id", "text", 0.12))
    assert(pe.contains("PartitionFilters") && pe.contains("__sb"),
      s"bucketed exact probe lost its partition filter:\n$pe")
    // signature index, bucket-hash-partitioned layout
    val mhDir = java.nio.file.Files.createTempDirectory("plan-mh-bkt").toString
    graft.ext.IncrementalMinHash.writeIndex(oldDocs, "doc_id", "text", mhDir,
      n = 3, bucketPartitions = 16)
    val pm = plan(graft.ext.IncrementalMinHash.nearDupPairs(spark, mhDir,
      shard, real, "doc_id", "text", 0.12))
    assert(pm.contains("PartitionFilters") && pm.contains("__bp"),
      s"partitioned signature probe lost its partition filter:\n$pm")
    assert(!pm.contains("CartesianProduct") &&
      !pm.contains("BroadcastNestedLoopJoin"),
      "signature probe plans an all-pairs join")
  }

  test("brute-force top-k broadcasts the query side (corpus never shuffled)") {
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.bruteForceTopK(all, all.where(col("vec_id") < 5),
      "vec_id", "embedding", k = 3))
    assert(p.contains("BroadcastExchange"), "query side should broadcast")
  }

  test("capped jaccard plans a window df-filter, not a join-back re-scan") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(Dedup.jaccardPairs(real, "doc_id", "text", n = 3,
      threshold = 0.5, maxDf = 50))
    assert(p.contains("Window"), "maxDf should be a window count")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // no join-back: the df cap must not appear as an extra shingle join
    // (window + the inverted-index self-join only; AQE reuses the
    // identical shingle exchanges at runtime)
    assert(!p.toLowerCase.contains("sortmergejoin [shingle"),
      s"df cap should not join back on shingle:\n$p")
  }

  test("connected components: star joins only, and iteration state is checkpointed") {
    val s = spark; import s.implicits._
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
    val p = plan(out)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"CC should never plan an all-pairs join:\n$p")
    // the returned mapping must read the CHECKPOINTED fixpoint edges, not
    // re-derive the whole iteration lineage (which would make the final
    // plan depth proportional to rounds × per-round operators)
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"CC result should scan checkpointed edges:\n$p")
    assert(p.linesIterator.size < 80,
      s"CC final plan should be flat, got ${p.linesIterator.size} lines")
  }

  test("tf-idf: corpus count N is a 1-row broadcast, aggregates are partial") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.TextStats.tfIdfTopTerms(real, "doc_id", "text", k = 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "N should join via broadcast, not shuffle")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"tf/df aggregates should be map-side partial in:\n$p")
  }

  test("deterministic sampling is a scan-side filter — no shuffle before the agg") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.Sampling.deterministicSample(real, "doc_id", 200000)
      .groupBy("lang").count())
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"sample+agg should shuffle exactly once:\n$p")
  }

  test("custom kernels appear in plans (graft_dot / graft_sign_projection)") {
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.lshTopK(all, all.where(col("vec_id") < 5),
      "vec_id", "embedding", k = 3, nPlanes = 2, tables = 2))
    assert(p.contains("graft_sign_projection"), "LSH should use the codegen kernel")
    assert(p.contains("graft_dot"), "scoring should use the codegen dot kernel")
  }

  test("span dedup: fingerprint agg partial map-side, no cartesian, no window text shuffled") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.SpanDedup.spans(real, "doc_id", "text", w = 12))
    assert(!p.contains("CartesianProduct"), s"span dedup plans a cartesian:\n$p")
    assert(p.contains("partial_count"),
      "occurrence counting should partial-aggregate map-side")
    // the scale contract: only fingerprints cross the occurrence-count
    // shuffle — no hashpartitioning exchange keyed on the gram text
    val gramKeyed = "Exchange hashpartitioning\\(gram".r.findAllIn(p)
    assert(gramKeyed.isEmpty, s"window TEXT is a shuffle key:\n$p")
  }

  test("line dedup: df count partial map-side, no cartesian, no line text in the count shuffle") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val lines = graft.ext.LineDedup.chunkLines(real, "doc_id", "text", w = 10)
    val p = plan(graft.ext.LineDedup.dropBoilerplate(real, "doc_id", "text",
      lines, minDocs = 2))
    assert(!p.contains("CartesianProduct"), s"line dedup plans a cartesian:\n$p")
    assert(p.contains("partial_count"),
      "line-frequency count should partial-aggregate map-side")
    // the scale contract: the frequency count shuffles 128-bit
    // fingerprints, never the line text itself
    val lineKeyed = "Exchange hashpartitioning\\(line#".r.findAllIn(p)
    assert(lineKeyed.isEmpty, s"line TEXT is a shuffle key:\n$p")
  }

  test("lm score: model joins broadcast, doc stream never shuffled on the trigram") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.NgramLm.selfScore(real, "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), "model joins should broadcast")
    assert(!p.contains("CartesianProduct"), s"lm score plans a cartesian:\n$p")
    // hash exchanges may key on (doc_id, tri) for the per-doc counts and
    // on doc_id for totals — but never on the trigram ALONE (that would
    // be a model-sized shuffle of the full document stream)
    val triOnly = "Exchange hashpartitioning\\(tri#\\d+, \\d+\\)".r.findAllIn(p)
    assert(triOnly.isEmpty, s"doc stream shuffled on trigram:\n$p")
  }

  test("pagerank: keyed joins only, iteration state checkpointed, no cartesian") {
    val s = spark; import s.implicits._
    val edges = spark.range(200).select(col("id").as("src"),
      explode(array((col("id") + 1) % 200, (col("id") * 3 + 5) % 200)).as("dst"))
    val df = graft.ext.PageRank.ranks(edges, "src", "dst", iters = 4)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pagerank iteration plans a product join:\n$p")
    // staged lineage: the visible plan hangs off a checkpointed scan,
    // not 4 rounds of raw join lineage
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD") ||
      p.contains("InMemory"), s"iteration state not checkpointed:\n$p")
  }

  test("shard shuffle: rank window partitioned by shard, never SinglePartition") {
    val ids = spark.range(500).withColumnRenamed("id", "doc_id")
    val p = plan(graft.ext.ShardShuffle.shuffleToShards(ids, "doc_id", 8, 12L))
    assert(!p.contains("SinglePartition"), s"global window in shuffle plan:\n$p")
    assert(p.contains("hashpartitioning(shard"), s"window not keyed on shard:\n$p")
  }

  test("nfc normalization is map-side only — no exchange") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.functions.NfcExpressions.nfc(col("text")).as("n"))
    val p = plan(df)
    assert(!p.contains("Exchange"), s"nfc projection shuffles:\n$p")
    assert(p.toLowerCase.contains("graft_nfc"),
      s"nfc kernel not visible in plan:\n$p")
  }

  test("gear CDC: chunk kernel is map-side; only digests reach the dedup shuffle") {
    import graft.ext.GearChunk
    val blobs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    // chunking itself: no exchange — blobs never leave their partition
    val pc = plan(GearChunk.chunks(blobs, "doc_id", "blob"))
    assert(!pc.contains("Exchange"), s"chunk kernel shuffles the blob:\n$pc")
    // dedup accounting: partial map-side agg on the digest, blob absent
    val pd = plan(GearChunk.dedupStats(GearChunk.chunks(blobs, "doc_id", "blob")))
    assert(pd.contains("partial_count") || pd.contains("partial_"),
      s"digest agg not partial:\n$pd")
    // the blob may appear in the scan-side projection feeding the
    // kernel; it must never ride an Exchange
    assert(pd.contains("Exchange hashpartitioning(chunk_sha256"),
      s"dedup shuffle not keyed on the digest:\n$pd")
    assert(!pd.linesIterator.exists(l => l.contains("Exchange") && l.contains("blob")),
      s"blob column crosses an exchange:\n$pd")
  }

  test("stratified sample: windows keyed on (group,salt) then group — never SinglePartition") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.Sampling.stratifiedK(d, "doc_id", "lang", k = 20))
    assert(!p.contains("SinglePartition"), s"global window in plan:\n$p")
    assert(p.contains("hashpartitioning(lang"), s"window not keyed on group:\n$p")
  }

  test("vocab coverage: top-N is TakeOrdered, never a full-vocabulary global sort") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ext.TextStats.vocabCoverage(d, "text", 50))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N not a distributed take-ordered:\n$p")
  }

  test("hourly gap-fill family: the axis cross join is broadcast, never cartesian") {
    // both axis sides are dimension-sized (hours × event types); the
    // only event-scale work is the hourly count aggregate
    for ((nm, df) <- Seq(
        "gapfill" -> RelationalQueries.eventsHourlyGapfill(spark, sf),
        "locf" -> RelationalQueries.eventsHourlyLocf(spark, sf),
        "interp" -> RelationalQueries.eventsHourlyInterp(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$nm plans a cartesian:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"),
        s"$nm axis join should broadcast a dimension side:\n$p")
    }
  }

  test("unigram usage aggregate is one shuffle with map-side partials") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val model = graft.ext.Unigram.FixturePieces.toMap
    val p = plan(graft.ext.Unigram.usageCounts(real, "doc_id", "text", model))
    // vocab aggregate + usage aggregate: partial_count / partial_sum
    // must appear (map-side combine before each exchange)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"usage aggregate lost its map-side partials:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("tfrecord read stays a map-side binaryFile scan (no shuffle)") {
    import org.apache.spark.sql.types._
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan-tfrec").toString
    val df = Seq((1L, "a")).toDF("id", "txt")
    graft.ext.TfRecordIo.write(df, dir)
    val p = plan(graft.ext.TfRecordIo.read(spark, dir, df.schema))
    assert(!p.contains("Exchange"), s"tfrecord read shuffles blobs:\n$p")
  }

  test("multimodal decode/feature extraction never shuffles the blob") {
    import graft.ext.Multimodal
    val ids = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    val blobs = Multimodal.synthesizeImages(spark, ids, "doc_id")
    // the scaladoc's 100 TB rule: codec work is map-side; metadata and
    // features leave the partition, the binary column never does
    for ((nm, df) <- Seq(
        "decodeMeta" -> Multimodal.decodeMeta(spark, blobs, "doc_id", "blob"),
        "channelSums" -> Multimodal.imageChannelSums(spark, blobs, "doc_id", "blob"),
        "checksums" -> Multimodal.imageChecksums(spark, blobs, "doc_id", "blob"),
        "resize" -> Multimodal.resizeImages(spark, blobs, "doc_id", "blob", 16, 12))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$nm shuffles the blob:\n$p")
    }
  }
}
