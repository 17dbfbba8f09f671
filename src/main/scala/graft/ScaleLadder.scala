package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder evidence for the 100 TB claims: generate a factor-F
  * copy of the bench tables that PRESERVES the workload's structure,
  * time the headline queries at 1× and F×, and record the fitted
  * scaling exponent (t_F = t_1 · F^e ⇒ e = log(t_F/t_1)/log F) in the
  * bench JSON. An exponent near 1 means the plan's cost is linear in
  * the data; near 2 means something quadratic survived.
  *
  * Structure preservation (so F× output ≈ F× workload, not a different
  * problem):
  *  - documents: replica k shifts ids by k·[[Stride]] and rotates
  *    letters AND digits by k (`translate`, a token bijection) —
  *    within-replica shingle/dup/quality structure is IDENTICAL to the
  *    base corpus, while cross-replica shingle collisions (which would
  *    inflate pair counts quadratically) are impossible for
  *    alphanumeric text;
  *  - embeddings: replica k cyclically rotates each vector by k
  *    positions — norms and within-replica similarity structure are
  *    exactly preserved, cross-replica sims decorrelate;
  *  - events: ids and user ids shift by k·[[Stride]] (per-user
  *    timelines replicate exactly; the CDC keyspace grows F×).
  */
object ScaleLadder {

  /** Id offset per replica — far above any base table's max id. */
  val Stride = 100000000L

  final case class Rung(name: String, t1: Double, tF: Double,
                        exponent: Double, note: String = "")

  private val Abc = "abcdefghijklmnopqrstuvwxyz"
  private val Digits = "0123456789"

  /** Per-replica text bijection: rotate letters by k%26 AND digits by
    * k%10, so numeric/punctuation-heavy tokens decorrelate across
    * replicas too (letters-only rotation left digit tokens
    * byte-identical, which on numeric corpora creates exactly the
    * cross-replica near-dup inflation the spec guards against).
    * Punctuation-ONLY tokens are still invariant — a corpus that is
    * mostly punctuation would need a different marker scheme; the spec
    * asserts zero cross-replica pairs on the actual bench corpus. */
  private def rotText(k: Int): Column = {
    val rL = k % 26
    val rD = k % 10
    if (rL == 0 && rD == 0) col("text")
    else {
      val rotAbc = Abc.drop(rL) + Abc.take(rL)
      val rotDig = Digits.drop(rD) + Digits.take(rD)
      translate(col("text"), Abc + Abc.toUpperCase + Digits,
        rotAbc + rotAbc.toUpperCase + rotDig)
    }
  }

  /** Cyclic vector rotation by k MOD the embedding size — safe for any
    * replica count, including factor > dimension (a fixed `k` slice
    * would go negative there). */
  private[graft] def rotVec(k: Int): Column =
    if (k == 0) col("embedding")
    else expr(
      s"concat(slice(embedding, ($k % size(embedding)) + 1, " +
        s"size(embedding) - ($k % size(embedding))), " +
        s"slice(embedding, 1, $k % size(embedding)))")

  /** Write the factor-F tables under `outDir` (by default documents,
    * embeddings, events — everything the ladder queries read; `tables`
    * restricts the set so a deep rung over one table doesn't pay for
    * generating the others at that factor). */
  def generate(spark: SparkSession, baseDir: String, outDir: String,
               factor: Int,
               tables: Seq[String] = Seq("documents", "embeddings", "events"))
      : Unit = {
    def replicate(table: String)(one: Int => DataFrame): Unit =
      if (tables.contains(table))
        (0 until factor).map(one).reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    lazy val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    replicate("documents") { k =>
      docs.select((col("doc_id") + lit(k.toLong * Stride)).as("doc_id"),
        rotText(k).as("text"), col("lang"), col("source"), col("n_chars"))
    }
    lazy val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    replicate("embeddings") { k =>
      emb.select((col("vec_id") + lit(k.toLong * Stride)).as("vec_id"),
        rotVec(k).as("embedding"), col("label"))
    }
    lazy val ev = spark.read.parquet(s"$baseDir/events.parquet")
    replicate("events") { k =>
      ev.select((col("event_id") + lit(k.toLong * Stride)).as("event_id"),
        col("ts"), (col("user_id") + lit(k.toLong * Stride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
  }

  /** The headline rungs. `llm_cosine_neardup_scale` stands in for the
    * cosine family: the recall-preset twin is quadratic BY DESIGN (few
    * planes ⇒ wide buckets — its role is ~100% recall at small n), so
    * the production preset is what a scale claim is about. */
  private val LadderQueries = Seq(
    "llm_neardup_jaccard",
    "llm_neardup_jaccard_prefix",
    "llm_span_dedup",
    "llm_semdedup",
    "llm_neardup_minhash",
    "llm_dedup_corpus_cc",
    "llm_cosine_neardup_scale",
    "llm_clean_corpus",
    "llm_domain_cap",
    "llm_pagerank",
    "llm_bm25_topk",
    "llm_unigram_train",
    "cdc_materialize_debezium")

  /** Fixed-plane LSH has candidate cost n²/2^planes — superlinear with
    * planes held constant. The production knob is raising the plane
    * count with log₂(n); the ladder pins the honest exponent and this
    * note explains it rather than hiding it. */
  private val Notes = Map(
    "llm_neardup_jaccard_prefix" ->
      ("AllPairs prefix filter at the production threshold 0.8, " +
        "UNCAPPED: candidate pairs come from each doc's rarest ~20% " +
        "of shingles (43.5k vs the full index's 1.27M at sf0.1), the " +
        "lossless alternative to the maxDf recall cap; below ~t=0.5 " +
        "the plain inverted index wins and is what llm_neardup_jaccard " +
        "uses. 3pt fit history (the r11 watchlist item): r14 measured " +
        "0.83/0.73 across two windows (one stormed); r15 quiet fit " +
        "0.76, within 0.01 of the unfiltered base rung's 0.75 - the " +
        "rank-window n log n term dominates, no superlinear knee"),
    "llm_cosine_neardup_scale" ->
      ("fixed 12-plane LSH: candidates scale n^2/2^p; at 10x data a " +
        "production deployment raises nPlanes by ~log2(10) to hold the " +
        "bucket width, which this rung deliberately does not do"),
    "llm_semdedup" ->
      ("fixed 16-cell quantizer: within-cell pairs scale n^2/k; the " +
        "paper's production recipe scales nCells with n (they use " +
        "~sqrt(n)) to hold occupancy, which this rung deliberately " +
        "does not do"),
    "llm_dedup_corpus_cc" ->
      ("on a QUIET host this rung is fixed-overhead-bound at bench " +
        "scale (large-star/small-star driver rounds + per-round " +
        "checkpoints ~4-5 s regardless of F; the data term is small " +
        "because cross-replica pairs cannot exist) — exponents near 0 " +
        "here measure the overhead floor; the pair-generation data " +
        "term is what llm_neardup_jaccard's rung carries"),
    "llm_pagerank" ->
      ("10 fixed synchronous iterations, out-degree 3: cost is " +
        "iters*|E| so ~linear is the floor AND the ceiling — iteration " +
        "count is a convergence knob independent of n, and the " +
        "edges/degrees layout is partitioned once and reused across " +
        "iterations (one agg shuffle per round)"),
    "llm_domain_cap" ->
      ("a frequency cap must rank every row once, so ~linear is the " +
        "floor; what the two-phase form buys is a per-reducer bound " +
        "(cap x salts rows per domain in the exact window) regardless " +
        "of domain skew — asserted on a 1000:1-skewed fixture in " +
        "UrlOpsSpec, not visible in this uniform-growth rung"),
    "llm_bm25_topk" ->
      ("direct (index-free) retrieval: one pass over the token stream " +
        "with the query-term filter applied before any shuffle, so " +
        "~linear scan is the floor; a STANDING query takes the served " +
        "path instead (llm_bm25_served rung), whose cost tracks the " +
        "probed posting lists, not the corpus"),
    "llm_unigram_train" ->
      ("hard-EM tokenizer training: the corpus is scanned ONCE (the " +
        "staged pre-token vocabulary aggregate); every EM/prune round " +
        "then iterates the DISTINCT vocabulary with a bounded-model " +
        "collect, so past the scan the cost tracks distinct words, " +
        "not rows. NOTE the ladder's rotation bijection grows distinct " +
        "words ~F x (each replica rotates the alphabet), so this rung " +
        "deliberately measures the WORST case; a real web corpus is " +
        "Zipf-capped far below row growth"))

  /** Per-rung wall budget (seconds): a rung whose timed body exceeds it
    * is ABORTED via job-group cancellation and recorded as aborted
    * (t = -1, exponent null) instead of stalling the whole artifact —
    * the r14 lesson, where one steal storm made the round's bench
    * unparseable. ~10× quiet-window headroom on the slowest rung. */
  private def rungBudgetSec: Double =
    sys.env.getOrElse("GRAFT_RUNG_BUDGET_SEC", "600").toDouble

  /** EVERY rung group the ladder can produce, for disclosed-skip
    * emission on the early-return path — a rung name that silently
    * vanishes from the artifact reads as "never existed" instead of
    * "deadline", violating the no-silent-caps rule the gated() path
    * enforces (the stage rungs have data-dependent names, so one
    * wildcard row stands in for the family, as in the in-line path). */
  private[graft] def allRungNames: Seq[String] =
    LadderQueries ++
      Seq("llm_dedup_incremental_fixed_new", "mm_cdc_incremental_fixed_new") ++
      DeepRungQueries.map(n => s"${n}_3pt") ++
      Seq("llm_clean_corpus_stage_*",
        "llm_minhash_index_bytes", "llm_dedup_index_bytes",
        "zorder_files_read", "llm_semdedup_scaledk", "llm_bm25_served",
        "llm_tfrecord_io", "llm_tfrecord_io_rolled")

  /** Whole-ladder deadline (seconds from run() start): once past it,
    * remaining rungs are SKIPPED with a disclosed note (the
    * no-silent-caps rule) so a storm degrades coverage, never the
    * artifact. Sized ~2× the quiet full-ladder wall. */
  private def ladderDeadlineSec: Double =
    sys.env.getOrElse("GRAFT_LADDER_DEADLINE_SEC", "2100").toDouble

  /** Run a timed body under the per-rung budget: a daemon timer cancels
    * the rung's job group at the budget and the abort is reported to
    * the caller (None) instead of propagating. Driver-side work between
    * jobs is not interruptible, but every expensive phase of a rung is
    * a Spark action. */
  private def withBudget[T](spark: SparkSession, label: String)
                           (body: => T): Option[T] = {
    val budget = rungBudgetSec
    if (budget <= 0) return Some(body)
    val sc = spark.sparkContext
    val group = s"ladder-$label"
    sc.setJobGroup(group, s"ladder rung $label", interruptOnCancel = true)
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val timer = new java.util.Timer("ladder-rung-budget", true)
    timer.schedule(new java.util.TimerTask {
      override def run(): Unit = {
        cancelled.set(true)
        System.err.println(s"[ladder] $label exceeded the ${budget}s rung " +
          "budget — cancelling its job group")
        sc.cancelJobGroup(group)
      }
    }, (budget * 1000).toLong)
    try Some(body)
    catch {
      case e: Throwable if cancelled.get() =>
        System.err.println(s"[ladder] $label aborted at the ${budget}s " +
          s"budget (${e.getClass.getSimpleName})")
        None
    } finally { timer.cancel(); sc.clearJobGroup() }
  }

  def run(spark: SparkSession, baseDir: String, factor: Int,
          onRung: Seq[Rung] => Unit = _ => (),
          deadlineSecOverride: Option[Double] = None): Seq[Rung] = {
    // resolved once: skip-row notes must name the deadline that ACTUALLY
    // expired, not the env default, when an override is in play
    val deadlineSec = deadlineSecOverride.getOrElse(ladderDeadlineSec)
    val deadlineNanos = System.nanoTime() + (deadlineSec * 1e9).toLong
    // progress plumbing: every completed (or skipped) rung re-emits the
    // full list so the caller can persist a parseable partial artifact
    // after EACH rung — a kill mid-ladder then costs the remaining
    // rungs, not the whole bench evidence (r14's failure mode)
    val acc = scala.collection.mutable.ArrayBuffer.empty[Rung]
    def emit(r: Rung): Unit = { acc += r; onRung(acc.toSeq) }
    def replace(r: Rung): Unit = {
      val i = acc.indexWhere(_.name == r.name)
      if (i >= 0) acc(i) = r else acc += r
      onRung(acc.toSeq)
    }
    def pastDeadline: Boolean = System.nanoTime() > deadlineNanos
    def skipped(name: String): Rung =
      Rung(name, -1.0, -1.0, Double.NaN,
        s"SKIPPED: ladder deadline (${deadlineSec}s) passed before " +
          "this rung started - coverage degraded, disclosed per the " +
          "no-silent-caps rule")
    /** Gate one rung group on the deadline: compute if time remains,
      * emit a disclosed skip row otherwise. */
    def gated(names: Seq[String])(compute: => Seq[Rung]): Unit =
      if (pastDeadline) names.foreach(n => emit(skipped(n)))
      else compute.foreach(emit)

    val root = graft.queries.CdcQueries.tempSinkDir("graft-ladder").toString
    val d1 = s"$root/x1"
    val dF = s"$root/x$factor"
    // 1x is a generated COPY too (rot-0), so both rungs read cold
    // parquet through identical code paths — timing the base sfDir
    // directly would let session caches built by earlier bench phases
    // contaminate the 1x side.
    generate(spark, baseDir, d1, 1)
    // a storm so bad that 1x generation alone ate the deadline must
    // not silently start the FULL factor-F generation on top
    if (pastDeadline) {
      allRungNames.foreach(n => emit(skipped(n)))
      return acc.toSeq
    }
    // keep the inventory honest: every name the in-line path can emit
    // as a group must appear in allRungNames (asserted in the spec too)
    generate(spark, baseDir, dF, factor)
    // Untimed JIT warmup on the 1x copy (shingle/codegen + JSON parse
    // paths): without it C2 compilation lands inside the first 1x
    // timings and the fitted exponents go NEGATIVE (measured at small
    // sf). Warmup queries are deliberately ones that do NOT populate
    // the dir-keyed shared caches a timed query later hits
    // (cdc_normalize_flink is uncached; cdc_materialize_debezium's
    // shared-normalize cache must stay cold so its 1x and Fx timings
    // are both first-touch — symmetric).
    SparkEntry.queries("llm_neardup_jaccard")(spark, d1).count()
    SparkEntry.queries("cdc_normalize_flink")(spark, d1).count()
    LadderQueries.foreach { name =>
      if (pastDeadline) emit(skipped(name))
      else {
        val fn = SparkEntry.queries(name)
        val allow = !CacheConsuming(name)
        val (t1, n1) = timedQuiet(spark, s"$name@1x", allow)(fn(spark, d1).count())
        // 1x aborted -> the exponent is null either way; don't spend a
        // second rung budget on the Fx side of a dead pair
        val (tF, nF) =
          if (t1 < 0) (-1.0, s" [$name@${factor}x skipped: 1x aborted]")
          else timedQuiet(spark, s"$name@${factor}x", allow)(fn(spark, dF).count())
        emit(Rung(name, t1, tF, fit(t1, tF, factor),
          Notes.getOrElse(name, "") + n1 + nF))
      }
    }
    val rungs = acc.toSeq
    // Incremental dedup with |new| FIXED across rungs (the base
    // replica's %10 shard) while the indexed corpus grows F× — the
    // "scales with |new|, not |corpus|" claim, measured. Index build is
    // the one-time ingest cost and stays untimed.
    def timedInc(dir: String, label: String): (Double, String) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val isNew = col("doc_id") < Stride && col("doc_id") % 10 === 0
      val idx = s"$dir/__inc_index"
      graft.ext.IncrementalDedup.writeIndex(docs.where(!isNew),
        "doc_id", "text", idx, n = 3,
        maxDf = graft.queries.LlmQueries.JaccardMaxDf,
        shingleBuckets = 16)
      // the probe reads the PERSISTED index — no session cache, retime ok
      timedQuiet(spark, label)(graft.ext.IncrementalDedup.nearDupPairs(spark, idx,
        docs.where(isNew), "doc_id", "text", threshold = 0.12).count())
    }
    gated(Seq("llm_dedup_incremental_fixed_new")) {
      val (t1, n1) = timedInc(d1, "llm_dedup_incremental_fixed_new@1x")
      val (tF, nF) = timedInc(dF, s"llm_dedup_incremental_fixed_new@${factor}x")
      Seq(Rung("llm_dedup_incremental_fixed_new", t1, tF, fit(t1, tF, factor),
        "|new| held constant while the indexed corpus grows Fx; the " +
          "residual slope is the index scan, which bucketing amortizes " +
          "on a cluster" + n1 + nF))
    }
    // Gear-CDC store probe with |new| fixed while the chunk store grows
    // F× — the same "scales with |new|, not |corpus|" claim as the
    // dedup rung above, for the content-defined-chunk path. Store build
    // is the one-time ingest cost and stays untimed.
    def timedCdcInc(dir: String, label: String): (Double, String) = {
      val blobs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      val isNew = col("doc_id") < Stride && col("doc_id") % 10 === 0
      val idx = s"$dir/__cdc_index"
      graft.ext.IncrementalGearChunk.writeIndex(blobs.where(!isNew),
        "doc_id", "blob", idx)
      // untimed warmup probe: the gear+SHA kernel and the probe's join
      // codegen JIT on first touch, and at ~1 s of timed work that
      // first-touch cost lands asymmetrically on whichever rung runs
      // first (measured as a NEGATIVE exponent in r13's committed
      // artifact) — same discipline as the ladder-wide warmup above
      graft.ext.IncrementalGearChunk.newBytes(spark, idx,
        blobs.where(isNew), "doc_id", "blob").count()
      timedQuiet(spark, label)(graft.ext.IncrementalGearChunk.newBytes(spark, idx,
        blobs.where(isNew), "doc_id", "blob").count())
    }
    gated(Seq("mm_cdc_incremental_fixed_new")) {
      val (t1, n1) = timedCdcInc(d1, "mm_cdc_incremental_fixed_new@1x")
      val (tF, nF) = timedCdcInc(dF, s"mm_cdc_incremental_fixed_new@${factor}x")
      Seq(Rung("mm_cdc_incremental_fixed_new", t1, tF, fit(t1, tF, factor),
        "|new| held constant while the chunk store grows Fx; the " +
          "residual slope is the touched-bucket store scan behind the " +
          "broadcast digest semi-join — production scales the bucket " +
          "count with the store so the probed fraction per batch stays " +
          "constant (this rung's 16 fixture buckets deliberately do " +
          "not)" + n1 + nF))
    }
    gated(DeepRungQueries.map(n => s"${n}_3pt")) {
      threePointRungs(spark, baseDir, root, factor, rungs)
    }
    // Stage-isolated clean-corpus rungs: the composed llm_clean_corpus
    // rung is fixed-overhead-bound at this scale (its exponent hovers
    // near 0 and constrains nothing), so the data-dependent terms are
    // measured per stage and the composed rung's note quantifies the
    // overhead floor (composed wall minus the stage sum). The composed
    // rung emitted above is REPLACED with its annotated form once the
    // stage times exist (the onRung consumer sees the final note).
    if (pastDeadline) emit(skipped("llm_clean_corpus_stage_*"))
    else {
      val stages1 = graft.queries.LlmQueries.cleanCorpusStageTimes(spark, d1)
      val stagesF = graft.queries.LlmQueries.cleanCorpusStageTimes(spark, dF)
      stages1.zip(stagesF).foreach {
        case ((name, t1, n1), (_, tF, nF)) =>
          emit(Rung(s"llm_clean_corpus_stage_$name", t1, tF,
            fit(t1, tF, factor),
            s"stage-isolated (inputs pre-persisted); out-rows $n1 at 1x " +
              s"-> $nF at ${factor}x: the rotation that decorrelates " +
              "replica shingles also destroys stopword statistics, so " +
              "rotated replicas fail the quality gate and post-filter " +
              "stages see near-constant data on generated corpora"))
      }
      rungs.find(r => r.name == "llm_clean_corpus" && r.t1 > 0 && r.tF > 0)
        .foreach { r =>
          val floor1 = r.t1 - stages1.map(_._2).sum
          val floorF = r.tF - stagesF.map(_._2).sum
          def f(d: Double): String = f"$d%.1f"
          replace(r.copy(note = "composed-pipeline rung constrains LITTLE " +
            s"at this scale, for two measured reasons: wall minus stage " +
            s"sum ~= ${f(floor1)} s at 1x / ${f(floorF)} s at ${factor}x " +
            "is fixed cost (plan analysis, checkpoints, CC driver " +
            "rounds), and the quality gate filters out rotated replicas " +
            "so post-filter stages see near-constant data (out-rows in " +
            "the llm_clean_corpus_stage_* rungs)" + r.note))
        }
    }
    gated(Seq("llm_minhash_index_bytes", "llm_dedup_index_bytes")) {
      indexSizeRungs(spark, d1)
    }
    gated(Seq("zorder_files_read")) { Seq(zorderRung(spark, d1, dF, factor)) }
    gated(Seq("llm_semdedup_scaledk")) {
      Seq(semdedupScaledKRung(spark, d1, dF, factor))
    }
    gated(Seq("llm_bm25_served")) {
      Seq(bm25ServedRung(spark, d1, dF, factor))
    }
    gated(Seq("llm_tfrecord_io")) {
      Seq(tfrecordIoRung(spark, d1, dF, factor))
    }
    gated(Seq("llm_tfrecord_io_rolled")) {
      Seq(tfrecordIoRolledRung(spark, d1, dF, factor))
    }
    acc.toSeq
  }

  /** TFRecord container IO at scale (write + streaming read-and-decode
    * wall): docs → CRC32C-framed `tf.train.Example` shards on the FS
    * seam → `binaryFile` streaming read, full proto decode, count.
    * Map-side in both directions with no shuffle (plan-asserted in
    * PlanShapeSpec), so ~linear is the FLOOR for a container path —
    * every byte is encoded, CRC'd, and re-verified exactly once — and
    * the rung's claim is the ABSENCE of any superlinear term
    * (per-record cost constant as shards grow F×). */
  private def tfrecordIoRung(spark: SparkSession, d1: String,
                             dF: String, factor: Int): Rung = {
    def at(dir: String, label: String): (Double, String) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val out = s"$dir/__tfrec_io"
      timedQuiet(spark, label) {
        graft.ext.TfRecordIo.write(docs.repartition(8), out)
        graft.ext.TfRecordIo.read(spark, out, docs.schema).count()
      }
    }
    val (t1, n1) = at(d1, "llm_tfrecord_io@1x")
    val (tF, nF) = at(dF, s"llm_tfrecord_io@${factor}x")
    Rung("llm_tfrecord_io", t1, tF, fit(t1, tF, factor),
      "container write+read+decode wall, map-side both directions: " +
        "~linear is the IO floor (every byte encoded, CRC'd and " +
        "re-verified once); the claim is no superlinear term as " +
        "shards grow Fx" + n1 + nF)
  }

  /** The rolled-compressed-shard layout at scale: same write+read wall
    * as [[tfrecordIoRung]] but with `maxRecordsPerFile` FIXED and zstd
    * compression on — shard SIZE stays constant while shard COUNT
    * grows F× (the TFDS delivery layout), so the rung measures the
    * per-shard roll overhead (file create, tmp-rename commit, zstd
    * stream open/close) that the single-shard-per-partition rung never
    * pays. Roll overhead is per-shard-constant, so ~linear is still
    * the claim; a superlinear fit here would mean shard-roll cost
    * grows with shard ORDINAL (a real bug at 100 TB, where one job
    * writes millions of shards). */
  private def tfrecordIoRolledRung(spark: SparkSession, d1: String,
                                   dF: String, factor: Int): Rung = {
    def at(dir: String, label: String): (Double, Long, String) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val out = s"$dir/__tfrec_io_rolled"
      val (t, note) = timedQuiet(spark, label) {
        graft.ext.TfRecordIo.write(docs.repartition(8), out,
          codec = "zstd", maxRecordsPerFile = 200)
        graft.ext.TfRecordIo.read(spark, out, docs.schema).count()
      }
      val shards = Option(new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .globStatus(new org.apache.hadoop.fs.Path(out, "*.tfrecord.zst")))
        .map(_.length.toLong).getOrElse(0L)
      (t, shards, note)
    }
    val (t1, s1, n1) = at(d1, "llm_tfrecord_io_rolled@1x")
    val (tF, sF, nF) = at(dF, s"llm_tfrecord_io_rolled@${factor}x")
    Rung("llm_tfrecord_io_rolled", t1, tF, fit(t1, tF, factor),
      s"rolled zstd shards at FIXED maxRecordsPerFile=200 ($s1 shards " +
        s"at 1x -> $sF at ${factor}x): shard size constant, count grows " +
        "Fx — the TFDS layout; ~linear proves roll overhead (create + " +
        "tmp-rename + zstd stream open/close) is per-shard-constant" +
        n1 + nF)
  }

  /** Fitted exponent, null-safe: an aborted rung (t = -1) yields NaN,
    * which [[toJson]] emits as JSON null. */
  private def fit(t1: Double, tF: Double, factor: Int): Double =
    if (t1 <= 0 || tF <= 0) Double.NaN
    else math.log(tF / t1) / math.log(factor.toDouble)

  /** BM25 SERVED from the persisted postings index, with the bucket
    * count scaled with the corpus (termBuckets ∝ n — the production
    * recipe, the [[semdedupScaledKRung]] discipline): probed bytes then
    * track the query's posting lists plus a constant bucket fraction,
    * so the fixed-query serving cost should stay ~flat while the index
    * grows F×. Index build is untimed (the persisted-index ingest-cost
    * discipline); the timed body is the pruned probe + kernel + top-k,
    * the per-query path. Generated replicas ROTATE the vocabulary, so
    * the fixed query's posting lists are ~constant across rungs by
    * construction — which is exactly this claim's regime (hit count
    * fixed, corpus grown); a query whose hit count itself grows F× pays
    * the posting-list term like the direct `llm_bm25_topk` rung. */
  private def bm25ServedRung(spark: SparkSession, d1: String,
                             dF: String, factor: Int): Rung = {
    def at(dir: String, buckets: Int, label: String): (Double, String) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val idx = s"$dir/__bm25_index"
      graft.ext.IncrementalBm25.writeIndex(docs, "doc_id", "text", idx,
        termBuckets = buckets)
      // the probe reads the PERSISTED index — no session cache, retime ok
      timedQuiet(spark, label)(graft.ext.IncrementalBm25.search(spark, idx,
        graft.queries.LlmQueries.Bm25QueryTerms, k = 25).count())
    }
    val (t1, n1) = at(d1, 16, "llm_bm25_served@1x")
    val (tF, nF) = at(dF, 16 * factor, s"llm_bm25_served@${factor}x")
    Rung("llm_bm25_served", t1, tF,
      math.log(tF / t1) / math.log(factor.toDouble),
      "served from the persisted postings index with termBuckets " +
        s"scaled with the corpus (16 -> ${16 * factor}): probed bytes " +
        "track the posting lists, not the index; build untimed (ingest " +
        "cost); replica vocab rotation holds the query's hit count " +
        "fixed BY CONSTRUCTION — the standing-query regime" + n1 + nF)
  }

  /** SemDeDup at the PAPER's production recipe — nCells ~ √n (Abbas et
    * al. 2023 §3): the fixed-16-cell rung's note promises the
    * within-cell pair term is controlled by scaling the cell count;
    * this rung measures it. With k = √n the candidate-pair term is
    * Σ|cell|² ≈ n²/k = n^1.5 — versus fixed-k's n² — so the fitted
    * exponent must sit clearly below the quadratic trajectory.
    * Quantizer training is untimed (the persisted-index ingest-cost
    * discipline); the timed body is assign + within-cell join + prune,
    * the per-query path. The kept-set invariant under scaled k is
    * asserted in SemDedupSpec. */
  private def semdedupScaledKRung(spark: SparkSession, d1: String,
                                  dF: String, factor: Int): Rung = {
    def at(dir: String, label: String): (Double, Long, Int, String) = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val k = math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
      val model = graft.ext.Ivf.train(emb, "vec_id", "embedding", nCells = k)
      val (t, note) = timedQuiet(spark, label)(
        graft.ext.SemDedup.prune(emb, "vec_id", "embedding", model,
          tau = 0.35).count())
      (t, n, k, note)
    }
    val (t1, n1, k1, note1) = at(d1, "llm_semdedup_scaledk@1x")
    val (tF, nF, kF, noteF) = at(dF, s"llm_semdedup_scaledk@${factor}x")
    Rung("llm_semdedup_scaledk", t1, tF,
      math.log(tF / t1) / math.log(factor.toDouble),
      s"the production recipe the fixed-16-cell note points at: " +
        s"k=sqrt(n) cells ($k1 over $n1 vectors at 1x, $kF over $nF at " +
        s"${factor}x) holds mean occupancy to sqrt(n), so candidate " +
        "pairs scale n^1.5 instead of fixed-k's n^2; quantizer " +
        "training is untimed ingest cost (persisted-index discipline)" +
        note1 + noteF)
  }

  /** The same counter [[BenchOne]] samples around forked reps. */
  private def stealSeconds(): Double = graft.util.HostProbe.stealSeconds()

  /** Rungs whose first execution populates session caches keyed on the
    * data dir (cachedDF'd capped pairs, the shared-normalize cache, the
    * session IVF model): a SECOND attempt of the same body would time a
    * cache scan, not the query — the asymmetry the warmup comment
    * guards against — so these are never retimed; a steal burst is
    * annotated instead (r12 ADVICE). */
  private val CacheConsuming = Set("llm_dedup_corpus_cc", "llm_clean_corpus",
    "llm_semdedup", "cdc_materialize_debezium")

  /** Time once; if host steal inside the window exceeded 10% of the
    * wall AND the rung's plan is cache-free, re-time ONCE and keep the
    * run from the QUIETER window (the smaller steal — never "the faster
    * number", so a genuine slowdown on a quiet machine is kept). Ladder
    * rungs are single-shot, so a steal burst otherwise lands directly
    * in a fitted exponent (measured r12: the same 30x point swung
    * 31 s ↔ 60 s between two contended windows). Returns the kept time
    * plus a note fragment recording any retime / skipped retime, so the
    * artifact itself discloses which numbers came from which window.
    * Both attempts go to stderr. */
  private def timedQuiet(spark: SparkSession, label: String,
                         retimeAllowed: Boolean = true)
                        (body: => Long): (Double, String) = {
    // None = the rung budget cancelled the body mid-flight
    def once(): Option[(Double, Double)] = {
      val s0 = stealSeconds()
      val t0 = System.nanoTime()
      val ran = withBudget(spark, label)(body)
      val dt = (System.nanoTime() - t0) / 1e9
      val s1 = stealSeconds()
      System.gc()
      ran.map(_ => (dt, if (s0 < 0 || s1 < 0) -1.0 else s1 - s0))
    }
    once() match {
      case None =>
        (-1.0, s" [$label: ABORTED at the ${rungBudgetSec} s rung " +
          "budget - recorded as t=-1 / exponent null so a steal storm " +
          "degrades this rung, never the artifact]")
      case Some((dt1, st1)) =>
        if (st1 < 0 || st1 <= 0.1 * dt1) (dt1, "")
        else if (!retimeAllowed) {
          System.err.println(
            s"[ladder] $label: ${fmtS(st1)} s steal inside a ${fmtS(dt1)} s " +
              "window — NOT retiming (cache-consuming rung)")
          (dt1, s" [$label: ${fmtS(st1)} s host steal inside this " +
            s"${fmtS(dt1)} s window, not retimed — the rung populates " +
            "session caches on first execution, so a retime would measure " +
            "a cache scan]")
        } else {
          System.err.println(
            s"[ladder] $label: ${fmtS(st1)} s steal inside a ${fmtS(dt1)} s " +
              "window — retiming once")
          once() match {
            case None =>
              (dt1, s" [$label: retime aborted at the rung budget; kept " +
                s"the first window ${fmtS(dt1)} s @${fmtS(st1)} s steal]")
            case Some((dt2, st2)) =>
              System.err.println(
                s"[ladder] $label retime: ${fmtS(dt2)} s (steal ${fmtS(st2)} s)")
              if (st2 < st1)
                (dt2, s" [$label: retimed on ${fmtS(st1)} s steal; kept the " +
                  s"quieter window ${fmtS(dt2)} s @${fmtS(st2)} s steal over " +
                  s"${fmtS(dt1)} s @${fmtS(st1)} s]")
              else
                (dt1, s" [$label: retime stayed louder (${fmtS(st2)} s steal); " +
                  s"kept the first window ${fmtS(dt1)} s @${fmtS(st1)} s steal]")
          }
        }
    }
  }

  private def fmtS(d: Double): String = (math.rint(d * 100) / 100).toString

  /** The two STEEPEST rungs ladder a second decade: a 2-point fit rests
    * on one decade and cannot see a super-linear knee past it, so the
    * near-linear suspects (`maxDf`-capped inverted index, CC iteration
    * count) get a third point at `factor2` and a least-squares exponent
    * over log t vs log F across {1, F, F2}. Documents-only generation —
    * both queries read nothing else. `GRAFT_LADDER_FACTOR2=0`
    * disables. */
  private val DeepRungQueries = Seq("llm_neardup_jaccard",
    // the scale path at the production threshold t=0.8: the AllPairs
    // prefix filter's candidate stream shrinks ~(1-t)² per doc, so its
    // fitted exponent is the one a high-threshold dedup deploys on —
    // the base rung above carries the exploratory-t pair-generation
    // linear floor (emitting EVERY qualifying pair at t=0.12 is ~linear
    // in this corpus by construction: replicas are decorrelated, each
    // contributes its own pair set)
    "llm_neardup_jaccard_prefix",
    "llm_dedup_corpus_cc")

  private def threePointRungs(spark: SparkSession, baseDir: String,
                              root: String, factor: Int,
                              twoPoint: Seq[Rung]): Seq[Rung] = {
    val factor2 = sys.env.getOrElse("GRAFT_LADDER_FACTOR2", "30").toInt
    if (factor2 <= factor)
      // config disabled the third point: disclosed, never dropped
      DeepRungQueries.map(name => Rung(s"${name}_3pt", -1.0, -1.0, Double.NaN,
        s"SKIPPED: GRAFT_LADDER_FACTOR2=$factor2 <= factor=$factor " +
          "disables the third point - disclosed per the no-silent-caps rule"))
    else {
      val d2 = s"$root/x$factor2"
      generate(spark, baseDir, d2, factor2, tables = Seq("documents"))
      def lsSlope(pts: Seq[(Double, Double)]): Double = {
        val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
        val n = pts.size
        val xm = xs.sum / n; val ym = ys.sum / n
        xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
          xs.map(x => (x - xm) * (x - xm)).sum
      }
      DeepRungQueries.map { name =>
        twoPoint.find(r => r.name == name && r.t1 > 0 && r.tF > 0) match {
          case Some(r) =>
            val (t2, n2) = timedQuiet(spark, s"${name}@${factor2}x",
              retimeAllowed = !CacheConsuming(name))(
              SparkEntry.queries(name)(spark, d2).count())
            val e = if (t2 <= 0) Double.NaN
              else lsSlope(Seq(1.0 -> r.t1, factor.toDouble -> r.tF,
                factor2.toDouble -> t2))
            def f(d: Double): String = f"$d%.1f"
            Rung(s"${name}_3pt", r.t1, t2, e,
              s"3-point least-squares over 1x/${factor}x/${factor2}x " +
                s"(t = ${f(r.t1)} / ${f(r.tF)} / ${f(t2)} s); tF is the " +
                s"${factor2}x time, exponent is the fitted slope; a knee " +
                "past the first decade would push it above the 2-point fit" +
                n2)
          case None =>
            // base pair missing or aborted: disclose, never drop
            Rung(s"${name}_3pt", -1.0, -1.0, Double.NaN,
              "SKIPPED: base 1x/Fx pair absent or aborted, no 3-point " +
                "fit possible - disclosed per the no-silent-caps rule")
        }
      }
    }
  }

  /** The z-order file-skipping claim at scale, MEASURED (rung values
    * are FILE COUNTS, not seconds): cluster the 1x and Fx generated
    * events copies at CONSTANT file size (targetFiles ∝ data), query
    * the same rectangle, record files actually read. The generator
    * strides user_id per replica, so the rectangle keeps selecting the
    * same absolute rows while the table grows Fx — a layout whose
    * pruning tracks the RECTANGLE holds files_read ~flat (exponent
    * near 0); a layout that degraded with scale would drift toward
    * exponent 1 (files_read ∝ files_total). */
  private def zorderRung(spark: SparkSession, d1: String, dF: String,
                         factor: Int): Rung = {
    val ranges: graft.sink.ZOrderLayout.Ranges =
      Map("user_id" -> (Some(10.0), Some(20.0)),
          "value" -> (Some(5.0), Some(10.0)))
    def filesRead(dir: String, files: Int): Double = {
      val zdir = s"$dir/__zorder"
      graft.sink.ZOrderLayout.write(
        spark.read.parquet(s"$dir/events.parquet"),
        Seq("user_id", "value"), zdir, targetFiles = files)
      val (kept, _) = graft.sink.ZOrderLayout.candidateFiles(spark, zdir, ranges)
      kept.size.toDouble
    }
    val n1 = filesRead(d1, 32)
    val nF = filesRead(dF, 32 * factor)
    Rung("zorder_files_read", n1, nF,
      math.log(nF / n1) / math.log(factor.toDouble),
      s"FILE COUNTS not seconds: files read for the gated rectangle at " +
        s"constant file size (32 files at 1x, ${32 * factor} at " +
        s"${factor}x); near 0 means pruned IO tracks the rectangle, " +
        "not the corpus")
  }

  /** On-disk bytes of a directory tree through the Hadoop FS (the same
    * filesystem the index writes went through). */
  private def dirBytes(spark: SparkSession, path: String): Double = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0.0 else fs.getContentSummary(p).getLength.toDouble
  }

  /** How many docs each long-variant document concatenates in
    * [[indexSizeRungs]]. */
  private val DocLenFactor = 5

  /** The "index size ∝ docs, not tokens" claim, MEASURED (rung values
    * are BYTES, not seconds). A variant corpus concatenates every
    * [[DocLenFactor]] documents into one — token volume ~constant, doc
    * count ÷[[DocLenFactor]] — and both incremental indexes are built
    * over base and variant. The exponent is d·log(size)/d·log(n_docs)
    * at fixed tokens: the signature index
    * ([[graft.ext.IncrementalMinHash]], a fixed `bands` rows per doc)
    * lands near 1 (size tracks docs), the exact postings+df index
    * ([[graft.ext.IncrementalDedup]]) near 0 (size tracks tokens — the
    * term the signature twin exists to drop at 100 TB). */
  private[graft] def indexSizeRungs(spark: SparkSession, dir: String): Seq[Rung] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val keyed = docs.select(
      (col("doc_id") / DocLenFactor).cast("long").as("gid"),
      col("doc_id"), col("text"))
    val longDocs = keyed.groupBy("gid")
      .agg(concat_ws(" ", transform(
        sort_array(collect_list(struct(col("doc_id"), col("text")))),
        x => x.getField("text"))).as("text"))
      .select(col("gid").as("doc_id"), col("text"))
    val root = graft.queries.CdcQueries.tempSinkDir("graft-idx-size").toString
    def buildBoth(d: DataFrame, tag: String): (Double, Double) = {
      val ex = s"$root/$tag-exact"; val mh = s"$root/$tag-mh"
      graft.ext.IncrementalDedup.writeIndex(d, "doc_id", "text", ex,
        n = 3, maxDf = graft.queries.LlmQueries.JaccardMaxDf)
      graft.ext.IncrementalMinHash.writeIndex(d, "doc_id", "text", mh, n = 3)
      (dirBytes(spark, s"$ex/shingles") + dirBytes(spark, s"$ex/df"),
        dirBytes(spark, s"$mh/buckets"))
    }
    val (exBase, mhBase) = buildBoth(docs, "base")
    val (exLong, mhLong) = buildBoth(longDocs, "long")
    def e(base: Double, long: Double): Double =
      math.log(base / long) / math.log(DocLenFactor.toDouble)
    val how = s"BYTES not seconds: t1 = index bytes on the base corpus, " +
      s"tF = on a ${DocLenFactor}x-longer/${DocLenFactor}x-fewer-docs " +
      "variant at ~constant tokens; exponent = dlog(size)/dlog(n_docs)"
    Seq(
      Rung("llm_minhash_index_bytes", mhBase, mhLong, e(mhBase, mhLong),
        s"$how; near 1 means size tracks DOCS (fixed rows/doc)"),
      Rung("llm_dedup_index_bytes", exBase, exLong, e(exBase, exLong),
        s"$how; near 0 means size tracks TOKENS (postings+df), the " +
          "storage term the signature twin drops"))
  }

  /** Ladder JSON. NaN/Infinity (aborted or skipped rungs) emit as JSON
    * null — `NaN` is not valid JSON and one stormed rung must never
    * make the whole artifact unparseable (the r14 failure). `partial`
    * marks an in-progress emission from the per-rung progress callback
    * so a killed run's artifact discloses its own incompleteness. */
  def toJson(factor: Int, rungs: Seq[Rung], partial: Boolean = false): String = {
    def num(d: Double): String =
      if (d.isNaN || d.isInfinite) "null"
      else (math.rint(d * 1000) / 1000).toString
    val qs = rungs.map { r =>
      val note = if (r.note.isEmpty) "" else s""","note":"${r.note}""""
      s""""${r.name}":{"t1":${num(r.t1)},"tF":${num(r.tF)},"exponent":${num(r.exponent)}$note}"""
    }.mkString("{", ",", "}")
    val part = if (partial) """"partial":true,""" else ""
    s"""{$part"factor":$factor,"queries":$qs}"""
  }

  /** Standalone entry: `runMain graft.ScaleLadder [baseDir [factor]]`. */
  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val rungs = run(spark, baseDir, factor)
    println(s"[ladder] ${toJson(factor, rungs)}")
    spark.stop()
  }
}
