package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** Gap sessionization: hand-checked boundaries, per-key independence,
  * deterministic tie handling; hash sampling: reproducibility under
  * repartition (the property rand() lacks). */
class SessionizeSpec extends SparkSpecBase {

  test("sessionize: gap starts a new session, equal-gap stays, keys independent") {
    val s = spark; import s.implicits._
    val ev = Seq(
      (1L, 0L), (1L, 100L), (1L, 101L),  // session 1 (gaps 100, 1)
      (1L, 300L),                        // gap 199 > 100 → session 2
      (2L, 0L), (2L, 100L)               // other key: own session 1 (gap == 100 stays)
    ).toDF("uid", "ts")
    val out = Sessionize.sessions(ev, Seq("uid"), col("ts"), gapMs = 100L)
      .orderBy("uid", "session_id").collect()
      .map(r => (r.getAs[Long]("uid"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms")))
    assert(out.toSeq === Seq(
      (1L, 1L, 3L, 0L, 101L),
      (1L, 2L, 1L, 300L, 300L),
      (2L, 1L, 2L, 0L, 100L)))
  }

  test("sessionize: single shuffle — both windows and the rollup share one exchange") {
    val s = spark; import s.implicits._
    val ev = Seq((1L, 0L), (1L, 50L), (2L, 0L)).toDF("uid", "ts")
    val plan = Sessionize.sessions(ev, Seq("uid"), col("ts"), gapMs = 100L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one hash exchange, got $exchanges:\n$plan")
  }

  test("saltedJoin: identical results to the plain join on skewed data") {
    val s = spark; import s.implicits._
    // 90% of fact rows share one hot key
    val fact = (1L to 1000L).map(i => (i, if (i <= 900) 1L else i % 7))
      .toDF("row_id", "key")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"), (6L, "e"))
      .toDF("key", "label")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "key", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = normalize(fact.join(dim, Seq("key")))
    val salted = normalize(SkewJoin.saltedJoin(fact, dim, "key", "row_id", salts = 8))
    assert(salted === plain)
    assert(plain.nonEmpty)
    // determinism under re-evaluation (what rand()-salting would break)
    val again = normalize(SkewJoin.saltedJoin(fact, dim, "key", "row_id", salts = 8))
    assert(again === salted)
  }

  test("saltedJoin: the salt participates in the shuffle so the hot key spreads") {
    val s = spark; import s.implicits._
    val fact = (1L to 1000L).map(i => (i, 1L)).toDF("row_id", "key") // one hot key
    val dim = Seq((1L, "hot")).toDF("key", "label")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SkewJoin.saltedJoin(fact, dim, "key", "row_id", salts = 8)
        .queryExecution.executedPlan.toString
      assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(plan).isDefined,
        s"__salt must be part of the join's shuffle partitioning:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the single hot key really fans out: its rows land on >1 sub-key
    val subKeys = fact
      .select(pmod(Sampling.bucket(col("row_id")), lit(8)).as("salt"))
      .distinct().count()
    assert(subKeys > 1, s"salt produced only $subKeys sub-key(s) for the hot key")
  }

  test("packing: concat-then-chunk offsets, budget cuts, spill-over property") {
    val s = spark; import s.implicits._
    // one shard so the layout is a single deterministic stream
    val docs = Seq(
      (1L, "a b c d"),    // 4 tokens, offset 0  → pack 0
      (2L, "e f g"),      // 3 tokens, offset 4  → pack 0
      (3L, "h i j k l"),  // 5 tokens, offset 7  → pack 0 (spills past 10)
      (4L, "m n")         // 2 tokens, offset 12 → pack 1
    ).toDF("doc_id", "text")
    val out = Packing.concatChunk(docs, "doc_id", "text",
        nShards = 1, budgetTokens = 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_offset"),
        r.getAs[Long]("pack_id")))
    assert(out.toSeq === Seq((1L, 0L, 0L), (2L, 4L, 0L), (3L, 7L, 0L), (4L, 12L, 1L)))
    val packs = Packing.packs(docs, "doc_id", "text", 1, 10L)
      .orderBy("pack_id").collect()
      .map(r => (r.getAs[Long]("pack_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("pack_tokens")))
    // pack 0 holds 12 tokens: only its LAST doc spills past the cut
    assert(packs.toSeq === Seq((0L, 3L, 12L), (1L, 1L, 2L)))
  }

  test("deterministicSample: same selection under repartition, rate in range") {
    val s = spark; import s.implicits._
    val docs = (1L to 2000L).map(i => (i, s"d$i")).toDF("id", "v")
    val a = Sampling.deterministicSample(docs, "id", perMillion = 200000)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "id", perMillion = 200000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b, "sample must be stable under repartition")
    // ~20% with slack: the scramble is a hash, not a guarantee per range
    assert(a.size > 2000 * 0.12 && a.size < 2000 * 0.28, s"rate off: ${a.size}/2000")
    // monotone: a smaller rate selects a subset
    val c = Sampling.deterministicSample(docs, "id", perMillion = 100000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("temperatureRates: weight arms, clamping, and budget proportionality") {
    val s = spark; import s.implicits._
    // skewed corpus: big source 90k tokens, small source 100
    val g = Seq(("big", 90000L), ("small", 100L)).toDF("src", "toks")
    def rates(alpha: Double, budget: Long): Map[String, (Long, Long)] =
      Sampling.temperatureRates(g, "toks", alpha, budget).collect()
        .map(r => r.getAs[String]("src") ->
          (r.getAs[Long]("weight"), r.getAs[Long]("rate_ppm"))).toMap
    // alpha=0.5: weights are integer sqrt
    val r05 = rates(0.5, 10000L)
    assert(r05("big")._1 === 300L && r05("small")._1 === 10L)
    // small source clamps at keep-everything (its quota >> its size)
    assert(r05("small")._2 === 1000000L)
    // big source rate = 10000*300*1e6 div (310*90000) ppm
    assert(r05("big")._2 === 10000L * 300 * 1000000 / (310L * 90000))
    // alpha=1.0: proportional — every group gets budget/total
    val r1 = rates(1.0, 9010L)
    assert(r1("big")._2 === r1("small")._2)
    // alpha=0.0: uniform weights — the small group clamps first
    val r0 = rates(0.0, 2000L)
    assert(r0("big")._1 === 1L && r0("small")._2 === 1000000L)
    // unsupported alpha fails loudly, never a silent pow() divergence
    intercept[IllegalArgumentException] { rates(0.7, 1000L) }
  }

  test("temperatureSample: deterministic kept set that tracks the budget") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    // 900 docs in 'big' (10 tokens each), 100 in 'small' (2 each)
    val docs = ((1L to 900L).map(i => (i, "big", 10L)) ++
      (1001L to 1100L).map(i => (i, "small", 2L))).toDF("id", "src", "toks")
    val g = docs.groupBy("src")
      .agg(org.apache.spark.sql.functions.sum("toks").as("toks"))
    val rates = Sampling.temperatureRates(g, "toks", 0.5, budgetTokens = 3000L)
    val kept = Sampling.temperatureSample(docs, "id", "src", rates)
    val a = kept.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(docs.repartition(17), "id", "src", rates)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b, "mixture sample must be stable under repartition")
    // 'small' clamps to keep-everything; 'big' keeps ~its quota
    assert((1001L to 1100L).forall(a.contains))
    val bigTokens = a.count(_ <= 900L) * 10L
    val quota = rates.where($"src" === "big").select("rate_ppm")
      .head().getLong(0) * 9000L / 1000000L
    assert(math.abs(bigTokens - quota) < 0.2 * quota,
      s"kept big tokens $bigTokens vs quota $quota")
  }
}
