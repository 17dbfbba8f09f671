package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GRAFT_BENCH_SMOKE=n: run only the first n queries in-JVM with no
    // canary/fork/stream/sink/layout/ladder phases — the harness test
    // mode (BenchArtifactSpec SIGKILLs a real Bench at first persist
    // and asserts the survivor parses; its completion twin runs one to
    // the end and asserts the final stdout line IS the one-line JSON).
    // Never set by the driver.
    val smoke = sys.env.get("GRAFT_BENCH_SMOKE").map(_.toInt)
    // GLOBAL WALL DEADLINE (the r14/r16 rc=124 lesson): every phase was
    // individually bounded, but the worst-case SUM sat far above the
    // round driver's kill limit — under the r16 steal storm the 32-core
    // run was killed mid-ladder and the one-line stdout JSON (the
    // round's per-query table) was forfeited even though every number
    // already existed in bench_out.json. GRAFT_BENCH_DEADLINE (seconds,
    // <=0 disables) bounds the sum: once the budget is spent, remaining
    // phases degrade to DISCLOSED skips (the "deadline" object in the
    // JSON) and the bench still persists and prints the final line.
    // The in-JVM sweep itself is never skipped — a query missing from
    // "queries" reads as dropped — and the fork phase re-times the
    // cache-contaminated alwaysFork rows first so a deadline cut can
    // never leave a fake-fast in-JVM number standing undisclosed.
    // Default 1740: the optimization judge's brief asks for <=1800 with
    // margin for sbt startup ahead of this JVM; raise it via env for
    // richer local artifacts (ladder rungs, stream floor) when no
    // external kill limit applies.
    val benchT0 = System.nanoTime()
    val deadlineSec = sys.env.getOrElse("GRAFT_BENCH_DEADLINE", "1740").toDouble
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    def remainingSec: Double =
      if (deadlineSec <= 0) Double.MaxValue else deadlineSec - elapsedSec
    val deadlineSkips =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    /** true = phase may run; false = budget too thin, skip recorded. */
    def gate(phase: String, needSec: Double): Boolean = {
      val ok = remainingSec >= needSec
      if (!ok && !deadlineSkips.contains(phase)) {
        val note = s"skipped at ${math.rint(elapsedSec)}s elapsed of the " +
          s"${deadlineSec}s global budget (needs ~${needSec}s)"
        deadlineSkips(phase) = note
        System.err.println(s"[bench] deadline: $phase $note")
      }
      ok
    }
    /** Seconds a bounded wait may still use: the phase's own cap or the
      * remaining global budget minus a persist+print reserve, whichever
      * is smaller (floored so an in-flight wait can always conclude). */
    def boundedWait(capSec: Long): Long =
      math.max(20L, math.min(capSec.toDouble, remainingSec - 45.0).toLong)
    val spark = SparkSessions.local(cpus)
    // Untimed warmup of the JSON/codegen hot paths: C2 compilation of the
    // parser loops costs 30-40s the first time a JSON-heavy plan runs and
    // lands on an arbitrary query otherwise (measured 45s cold vs 6s warm
    // for the same query).
    try SparkEntry.queries("cdc_materialize_debezium")(spark, sfDir)
      .limit(2000).count()
    catch { case _: Throwable => () }
    // Deterministic order + a GC break between queries: 50+ queries share
    // one JVM, and accumulated shuffle/broadcast garbage otherwise makes
    // per-query times swing 3-5× run-to-run. A failed query records the
    // sentinel -1.0 (and logs) rather than masquerading as a fast run.
    def timed(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      if (ok) dt else -1.0
    }

    /** Fresh-JVM re-time for the heavy queries: in-JVM timings of >5s
      * queries swing 2-3× ACROSS medians because accumulated JIT/GC/
      * shuffle state from the 50 preceding queries leaks into them —
      * median-of-3 in the shared JVM cannot damp that. A forked JVM runs
      * [[BenchOne]] with ADAPTIVE untimed warmup — in practice 2-4 reps,
      * because steadiness requires two consecutive warmup timings within
      * 1.25× (the cap is 4) — then 3 timed reps on an otherwise-quiet
      * heap; the classpath/JVM flags are inherited from this process
      * (`run / fork := true` makes java.class.path the real app
      * classpath). Returns all rep times, newest-first ordering
      * preserved; None on any failure → caller falls back to in-JVM
      * re-timing so the bench NEVER loses a query to fork plumbing. */
    def forkedReps(name: String): Option[Seq[(Double, Double, Double, Double)]] =
      try {
        import scala.jdk.CollectionConverters._
        val javaBin = java.nio.file.Paths.get(
          System.getProperty("java.home"), "bin", "java").toString
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments.asScala.toSeq
        val cmd = Seq(javaBin) ++ jvmArgs ++
          Seq("-cp", System.getProperty("java.class.path"),
            "graft.BenchOne", name, sfDir)
        val pb = new ProcessBuilder(cmd.asJava)
        // Adaptive warmup (2-4 reps in practice — steadiness needs two
        // consecutive timings, so the configured min of 1 always grows
        // to at least 2; cap 4): BENCH_r07 showed 3-4× rep spread
        // inside one fork when the machine is contended — warmup reps
        // continue until two consecutive ones agree within 1.25×, and
        // only then do the timed reps start (see BenchOne's scaladoc).
        pb.environment().put("GRAFT_WARMUP", "1")
        pb.environment().put("GRAFT_MAX_WARMUP", "4")
        // 3 reps normally; if they disagree by >1.5x (a rep caught a
        // major GC / OS hiccup), BenchOne extends to 5 — all recorded;
        // the consumer computes BOTH median-over-all and the
        // quiet-window median and re-forks when they diverge (see the
        // medians map below), so outliers widen evidence instead of
        // deciding the headline number
        pb.environment().put("GRAFT_REPS", "3")
        pb.environment().put("GRAFT_MAX_REPS", "5")
        pb.environment().put("GRAFT_EXTRA_ON_SPREAD", "1.5")
        // Child stderr (Spark logs) must not fill a pipe and deadlock;
        // stdout is only the few [bench-one] lines.
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val p = pb.start()
        // Drain stdout on a daemon thread: a blocking readAllBytes here
        // would never reach the waitFor timeout, so a wedged forked
        // query would hang the whole bench instead of falling back.
        val outBuf = new java.io.ByteArrayOutputStream()
        val drain = new Thread(() =>
          try p.getInputStream.transferTo(outBuf)
          catch { case _: Throwable => () })
        drain.setDaemon(true)
        drain.start()
        // per-fork cap, additionally bounded by the remaining global
        // budget so one wedged fork can never eat the final persist
        val done = p.waitFor(boundedWait(600), java.util.concurrent.TimeUnit.SECONDS)
        if (!done) { p.destroyForcibly(); None }
        else {
          drain.join(10000)
          val out = outBuf.toString
          val Rep =
            ("""\[bench-one\] \S+ rep\d+ rows=\d+ ([0-9.]+) s""" +
              """(?: cal=([0-9.]+) steal=(-?[0-9.]+)(?: gc=([0-9.]+))?)?""").r
          val reps = Rep.findAllMatchIn(out)
            .map(m => (m.group(1).toDouble,
              Option(m.group(2)).map(_.toDouble).getOrElse(-1.0),
              Option(m.group(3)).map(_.toDouble).getOrElse(-1.0),
              Option(m.group(4)).map(_.toDouble).getOrElse(-1.0))).toSeq
          // 3 reps normally, up to 5 when BenchOne extended on spread
          if (p.exitValue() == 0 && reps.size >= 3) Some(reps) else None
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] fork for $name failed: ${e.getMessage}")
        None
      }

    // Double.toString is locale-independent ('.' decimal always) — the
    // JSON contract must not go through a default-locale formatter.
    def num(d: Double): String = (math.rint(d * 1000) / 1000).toString
    // Two estimators per forked query (defined up here because the
    // canary phase below uses them too), BOTH recorded in the artifact
    // — see the fork-phase comment for the full rationale.
    def medianAll(rc: Seq[(Double, Double, Double, Double)]): Double = {
      val v = rc.map(_._1).sorted; v(v.size / 2)
    }
    def medianQuiet(rc: Seq[(Double, Double, Double, Double)]): Double =
      if (rc.exists(_._2 <= 0)) medianAll(rc) // probe unreadable → no filter
      else {
        val noBurst = rc.filter(_._3 <= 1.0)
        val pool = if (noBurst.size >= 3) noBurst else rc
        val quiet = pool.zipWithIndex
          .sortBy { case (r, i) => (r._2, i) }.take(3).map(_._1._1)
        quiet.sorted.apply(quiet.size / 2)
      }

    // CROSS-ROUND CANARY: a frozen 12-query subset (cdc/relational/llm
    // mix) timed FIRST, each in a fresh forked JVM, before the in-JVM
    // sweep touches any session state. The r11→r12 common-subset drift
    // (+5.2% on identical queries) was unattributable because every
    // recorded number shared a JVM with a suite that grew 116→158 rows;
    // the canary isolates ENGINE drift from suite-growth/session
    // pressure — judges compare canary-to-canary across rounds. The
    // list is append-only frozen: changing it breaks the comparison it
    // exists for.
    val canaryQueries = if (smoke.isDefined) Seq.empty[String] else Seq(
      "q1_pricing", "q3_revenue", "events_sessions", "events_hourly",
      "cdc_normalize_debezium", "cdc_latest_rownumber",
      "cdc_materialize_debezium",
      "llm_neardup_jaccard", "llm_line_dedup", "llm_lm_score",
      "llm_pack_stats", "text_quality_score")
    // The driver captures only the stdout TAIL — BENCH_r08.json lost 43
    // of 89 timings to truncation. Persist the complete line to a file
    // (repo root, next to the driver artifacts) so every round's full
    // query set stays judgeable. ATOMIC (tmp + move): a kill mid-write
    // must never leave a half-written unparseable artifact — r14's
    // driver bench died rc=124 with parsed:null and the round's one
    // mechanical bench check was lost.
    // Serialized + closeable: after a ladder Await timeout the orphaned
    // Future's onRung callback can still fire, racing the main thread's
    // final persist on the shared tmp path — two writeString calls
    // interleaving before the atomic move would move a TORN artifact
    // (the exact storm the atomicity exists against). The lock makes
    // each write+move indivisible; `persistClosed` makes the final
    // persist terminal so a late partial can never overwrite it. Each
    // call also gets a UNIQUE tmp name so even a same-instant second
    // JVM (never expected) cannot share a tmp file.
    val persistLock = new Object
    @volatile var persistClosed = false
    val persistSeq = new java.util.concurrent.atomic.AtomicLong(0)
    def persistWith(line: String, terminal: Boolean): Unit =
      persistLock.synchronized {
        if (!persistClosed) try {
          val out = java.nio.file.Paths.get("bench_out.json")
          val tmp = java.nio.file.Paths.get(
            s"bench_out.json.tmp.${ProcessHandle.current().pid()}." +
              s"${persistSeq.incrementAndGet()}")
          java.nio.file.Files.writeString(tmp, line + "\n")
          java.nio.file.Files.move(tmp, out,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          if (terminal) persistClosed = true
          System.err.println(s"[bench] full JSON written to bench_out.json")
        } catch { case e: Throwable =>
          System.err.println(s"[bench] could not write bench_out.json: ${e.getMessage}")
        }
      }
    def persist(line: String): Unit = persistWith(line, terminal = false)
    val noStream = """{"events":0,"batches":0,"sec":-1,"events_per_sec":-1}"""
    val noCmp = """{"events_per_batch":0,"batches":0,"cow_eps":-1,"mor_eps":-1}"""
    val noLadder = """{"factor":0,"queries":{}}"""
    val noLayout = """{"files_total":0,"files_read":0,"rows":0,"full_sec":-1,"pruned_sec":-1}"""
    // Phase-skeleton persist BEFORE any slow phase: a parseable artifact
    // exists within seconds of start, and each later phase replaces it
    // with a strictly richer one (queries -> stream -> sink -> layout ->
    // per-ladder-rung). `phase` names how far the run got.
    def skeleton(phase: String, canary: String): String =
      s"""{"metric":"total","value":0,"unit":"sec","phase":"$phase",""" +
        s""""queries":{},"canary":$canary,"stream":$noStream,""" +
        s""""sink_small_batch":$noCmp,"zorder_layout":$noLayout,""" +
        s""""ladder":$noLadder,"sf":"$sfDir"}"""
    persist(skeleton("started", """{"queries":{}}"""))
    // Canary forks may spend at most the first ~35% of the global
    // budget: under a steal storm each fork stretches 2-4x and an
    // ungated canary alone could eat the sweep's time. A gated-out
    // canary records -1.0 (the existing fork-failed sentinel) plus the
    // disclosed deadline note.
    val canaryResults: Seq[(String, Option[Seq[(Double, Double, Double, Double)]])] =
      canaryQueries.map { name =>
        val r = if (gate("canary", 0.65 * deadlineSec)) forkedReps(name) else None
        System.err.println(s"[bench] canary $name -> " +
          r.map(rs => num(medianQuiet(rs)) + " s").getOrElse("FORK FAILED"))
        (name, r)
      }
    // Frozen cross-round baseline: the r13-final committed artifact's
    // canary quiet medians + median cal probes (231.2 s run, commit
    // 4432f7b). The judge's comparison is vs THESE embedded values —
    // never prose-quoted ones (r13 bookkeeping flag: quoted baselines
    // drifted from the committed artifact). cal prices the host's
    // single-thread speed; compare cal-to-cal before reading any
    // canary delta as engine drift. Update only when a round's final
    // artifact is blessed as the new baseline.
    val canaryBaselineRound = 13
    val canaryBaseline: Seq[(String, Double, Double)] = Seq(
      ("q1_pricing", 0.417, 0.116), ("q3_revenue", 0.690, 0.098),
      ("events_sessions", 0.561, 0.102), ("events_hourly", 0.435, 0.118),
      ("cdc_normalize_debezium", 2.354, 0.110),
      ("cdc_latest_rownumber", 0.415, 0.108),
      ("cdc_materialize_debezium", 0.311, 0.105),
      ("llm_neardup_jaccard", 1.726, 0.106), ("llm_line_dedup", 0.469, 0.126),
      ("llm_lm_score", 2.832, 0.105), ("llm_pack_stats", 0.435, 0.098),
      ("text_quality_score", 0.252, 0.104))

    def canaryJson(full: Boolean): String = {
      val qs = canaryResults.map { case (k, r) =>
        "\"" + k + "\":" + r.map(rs => num(medianQuiet(rs))).getOrElse("-1.0")
      }.mkString("{", ",", "}")
      if (!full) s"""{"queries":$qs}"""
      else {
        val reps = canaryResults.map { case (k, r) =>
          "\"" + k + "\":" +
            r.map(_.map(x => num(x._1)).mkString("[", ",", "]")).getOrElse("[]")
        }.mkString("{", ",", "}")
        val steals = canaryResults.map { case (k, r) =>
          "\"" + k + "\":" +
            r.map(_.map(x => num(x._3)).mkString("[", ",", "]")).getOrElse("[]")
        }.mkString("{", ",", "}")
        // per-rep calibration-probe seconds: the fixed pure-CPU loop
        // that prices THIS host's single-thread speed — r13 showed
        // cross-round canary deltas can be host variance (cal moved
        // ~30% between rounds), so the judge compares cal-to-cal
        // before reading any canary delta as engine drift
        val cals = canaryResults.map { case (k, r) =>
          "\"" + k + "\":" +
            r.map(_.map(x => num(x._2)).mkString("[", ",", "]")).getOrElse("[]")
        }.mkString("{", ",", "}")
        val baseQ = canaryBaseline
          .map { case (k, t, _) => "\"" + k + "\":" + num(t) }
          .mkString("{", ",", "}")
        val baseCal = canaryBaseline
          .map { case (k, _, c) => "\"" + k + "\":" + num(c) }
          .mkString("{", ",", "}")
        // mechanical per-query ratio current/baseline (quiet medians);
        // -1.0 = fork failed this round
        val baseMap = canaryBaseline.map(b => b._1 -> b._2).toMap
        val deltas = canaryResults.map { case (k, r) =>
          val ratio = r.flatMap { rs =>
            baseMap.get(k).map(b => medianQuiet(rs) / b)
          }.getOrElse(-1.0)
          "\"" + k + "\":" + num(ratio)
        }.mkString("{", ",", "}")
        s"""{"queries":$qs,"reps":$reps,"steal":$steals,"cal":$cals,""" +
          s""""baseline":{"round":$canaryBaselineRound,"queries":$baseQ,""" +
          s""""cal":$baseCal},"ratio_vs_baseline":$deltas}"""
      }
    }

    // post-canary persist: the 12 canary forks are minutes of work a
    // kill must not erase
    if (canaryQueries.nonEmpty) persist(skeleton("canary", canaryJson(true)))
    val sweep = {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      smoke.map(all.take).getOrElse(all)
    }
    val first = sweep.map { case (name, fn) =>
      (name, fn, timed(name, fn))
    }
    // The fork phase runs every heavy query in a FRESH 24g JVM while this
    // parent merely waits — but the parent still holds every DataFrame the
    // shared caches persisted across the 80+ in-JVM runs, and two 24g
    // heaps plus page cache is exactly the pressure regime where forked
    // reps caught 2-3× spikes (standalone forks of the same queries are
    // tight). Drop the caches and hand the memory back before forking;
    // the in-JVM fallback path just re-materializes on demand.
    // Drop the TrieMap entries FIRST: clearCache unpersists the plans,
    // and a map still serving those DataFrames would make the in-JVM
    // fallback path recompute full pipelines per action (cold timings
    // blended into the median); cleared maps re-materialize AND
    // re-persist on next access, restoring the phase-one regime.
    graft.queries.CdcQueries.dropSharedCaches()
    graft.queries.LlmQueries.dropSharedCaches()
    spark.catalog.clearCache()
    System.gc()
    // Queries re-timed in a fork REGARDLESS of their in-JVM time:
    // events_sessions drifted 1.02 → 1.46 s across rounds 6-7 purely from
    // in-JVM noise (same plan family; it sat under the 5 s fork line), so
    // its recorded time now always comes from a quiet forked JVM.
    // The llm_* production queries here have plans that recall-row
    // harness caches persist (LlmQueries.cachedDF persists the
    // registered queries' own plans): Spark's cache manager substitutes a
    // persisted plan into an EQUAL registered plan, faking the in-JVM
    // time (observed llm_neardup_jaccard 4.4 s → 0.24 s). A fresh fork
    // has no caches → the recorded time is the production pipeline,
    // regardless of in-JVM run order.
    // cdc_normalize_{debezium,dms,inferalways}: their plans contain the
    // exact subtree CdcQueries' sharedNormalized(Dms) persists for the
    // DERIVED queries (materialize/merge/catalog run first
    // alphabetically and populate it), so their in-JVM runs time a
    // cache scan — observed cdc_normalize_dms 0.10 s vs its uncached
    // strict/flink siblings at 2.4-2.8 s.
    // events_zorder_pruned / llm_cosine_topk_pq / llm_decontam_bloom:
    // their in-JVM first run pays the one-time session-cached INDEX
    // BUILD (clustered write / PQ train+encode / bloom build); the fork
    // rebuilds it in untimed warmup, so the timed reps measure the
    // production read path.
    val alwaysFork = Set("events_sessions", "llm_neardup_jaccard",
      "events_zorder_pruned", "llm_cosine_topk_pq", "llm_decontam_bloom",
      "llm_neardup_minhash", "llm_cosine_neardup", "llm_cosine_neardup_scale",
      "cdc_normalize_debezium", "cdc_normalize_dms", "cdc_normalize_inferalways",
      // index-backed incremental rows: their in-JVM first run pays the
      // one-time session-cached index build (window-count / LM-count /
      // clustered-IVF); the fork rebuilds it in untimed warmup so the
      // timed reps measure the production probe path
      "llm_span_dedup_incremental", "llm_lm_incremental",
      "llm_semdedup_incremental", "llm_kmeans_incremental",
      // split-leakage rows consume the session-cached capped pair set
      // (cachedDF persists the plan — in-JVM time would be a cache
      // scan); the incremental diff builds a session-cached index
      "llm_split_leakage", "llm_split_stats",
      "llm_split_safe", "llm_split_safe_stats",
      "llm_snapshot_diff_incremental", "mm_phash_incremental")
    // Heavy-tail re-time in a FRESH JVM, recording every rep so a judge
    // (or a regression diff) sees the spread, not just the median.
    // Failed forks fall back to the previous in-JVM median-of-3; a query
    // whose FIRST run failed stays failed (-1.0).
    val reps = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // per-rep (calibration-probe sec, host-steal sec) — the machine-noise
    // evidence behind each forked rep, emitted as "reps_env"
    val repsEnv = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(Double, Double, Double)]]
    // per-forked-query (median over ALL reps, quiet-window median,
    // whether a divergence re-fork ran) — emitted as "medians" so the
    // unfiltered and the noise-filtered estimators can be compared in
    // the artifact itself
    val medians = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Boolean)]
    // Fork line at 3 s (was 5): cdc_materialize_dms measured 4.6 s
    // in-JVM vs 0.31 s in a quiet fork — in-JVM contamination (shared
    // caches materializing, parent heap pressure) can inflate a
    // mid-range query ~15× while staying under a 5 s line, and the
    // recorded number then reads as a regression against the previous
    // round's quiet-fork figure. A few extra forks (~25 s each) buy
    // every recorded mid-range time coming from a fresh JVM.
    // Two estimators per forked query, BOTH recorded in the artifact:
    //  - median_all: plain median over every recorded rep — immune to
    //    selection bias, but blends shared-VM noise bursts into the
    //    number (host CPU steal inflates identical pure-CPU work up to
    //    ~4×, diagnosed r11 with a standalone burn loop);
    //  - median_quiet: after dropping steal-burst reps (>1 s of steal),
    //    the median over the 3 reps whose post-rep calibration probe was
    //    LOWEST — the reps measured on the quietest machine this fork
    //    saw. The tie-break among equal-cal windows is ORDER-STABLE
    //    (arrival index), never the measured value itself: tie-breaking
    //    on the rep's own runtime (r11) made the estimator min-biased —
    //    a genuine regression surfacing as occasional slow reps would
    //    have been systematically discarded.
    // The headline number is median_quiet (defined above the canary
    // phase), but it is only trusted when the two agree: if they
    // diverge >1.5× the fork window itself was noisy, and the row is
    // RE-FORKED once — both medians recomputed over the merged rep
    // pool — instead of letting the filter decide.
    // Fork order is PRIORITY order, not sweep order: the alwaysFork rows
    // run first because their in-JVM numbers are known cache-contaminated
    // (a deadline cut must never leave e.g. cdc_normalize_dms's 0.10 s
    // cache-scan time standing as the recorded number without a
    // disclosure), then the remaining >3 s rows by in-JVM time
    // descending — the rows where a quiet re-time changes the most.
    // Each fork is an independent fresh JVM, so order cannot change any
    // measured value; it only changes which rows still get re-timed
    // when the global budget runs short. Gated-out forks keep their
    // in-JVM time and are listed in deadline.fork_skipped.
    val needsFork = first.filter { case (name, _, t) =>
      smoke.isEmpty && (t > 3.0 || (t >= 0 && alwaysFork(name))) }
    val forkOrder = needsFork.filter(q => alwaysFork(q._1)) ++
      needsFork.filterNot(q => alwaysFork(q._1)).sortBy(-_._3)
    val forkSkipped = scala.collection.mutable.LinkedHashSet.empty[String]
    val forkOutcome = scala.collection.mutable.Map.empty[String, Double]
    forkOrder.foreach { case (name, fn, t) =>
      if (!gate("fork_retimes", 420)) forkSkipped += name
      else forkedReps(name) match {
          case Some(rsCal0) =>
            var rsCal = rsCal0
            var reforked = false
            // Re-fork triggers: estimator divergence (the filter would
            // be deciding the number) OR raw rep spread >3× (one fork
            // window caught a host-contention spike — standalone
            // re-times of the same rows sit within 1.1×, so a wide
            // fork is machine evidence worth doubling, not averaging
            // away silently).
            val divergent =
              math.max(medianAll(rsCal), medianQuiet(rsCal)) >
                1.5 * math.min(medianAll(rsCal), medianQuiet(rsCal))
            val spiked = rsCal.map(_._1).max > 3.0 * rsCal.map(_._1).min
            if (divergent || spiked) {
              System.err.println(s"[bench] $name median_all=" +
                s"${medianAll(rsCal)} median_quiet=${medianQuiet(rsCal)} " +
                s"spread=${rsCal.map(_._1).max / rsCal.map(_._1).min}" +
                " — re-forking for a second rep pool")
              forkedReps(name).foreach { extra =>
                rsCal = rsCal ++ extra; reforked = true
              }
            }
            reps(name) = rsCal.map(_._1)
            repsEnv(name) = rsCal.map(r => (r._2, r._3, r._4))
            medians(name) = (medianAll(rsCal), medianQuiet(rsCal), reforked)
            forkOutcome(name) = medianQuiet(rsCal)
          case None =>
            val rs = Seq(t, timed(name, fn), timed(name, fn)).filter(_ >= 0)
            reps(name) = rs
            forkOutcome(name) =
              if (rs.isEmpty) -1.0 else rs.sorted.apply(rs.size / 2)
        }
    }
    // Recorded values in sweep order: the forked re-time when one ran,
    // the in-JVM time otherwise (including deadline-gated rows, which
    // deadline.fork_skipped discloses).
    val results = first.map { case (name, _, t) =>
      name -> forkOutcome.getOrElse(name, t)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rs = reps.map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val rsEnv = repsEnv.map { case (k, v) =>
      s"\"" + k + "\":{\"cal\":" + v.map(_._1).mkString("[", ",", "]") +
        ",\"steal\":" + v.map(_._2).mkString("[", ",", "]") +
        ",\"gc\":" + v.map(_._3).mkString("[", ",", "]") + "}"
    }.mkString("{", ",", "}")
    val medStr = medians.map { case (k, (a, q, rf)) =>
      s"\"" + k + "\":{\"all\":" + a + ",\"quiet\":" + q +
        ",\"reforked\":" + rf + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // `full = false` drops the per-rep evidence arrays from the line:
    // the driver captures only a bounded stdout TAIL and its JSON parse
    // of the r11 line (with reps/reps_env inlined) came back null. The
    // printed line stays parseable; bench_out.json holds everything.
    def jsonLine(stream: String, sinkCmp: String, layout: String,
                 ladder: String, full: Boolean = true): String = {
      val evidence =
        if (full) s""","reps":$rs,"reps_env":$rsEnv,"medians":$medStr"""
        else ""
      // Disclosed global-deadline state: which phases (and which fork
      // re-times) were degraded to skips, so a judge reading a cut
      // artifact sees WHAT is missing and WHY instead of a silent gap.
      val skipsJs = deadlineSkips
        .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString("{", ",", "}")
      val forkSkJs = forkSkipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val dl = s""""deadline":{"budget_sec":${num(deadlineSec)},""" +
        s""""elapsed_sec":${num(elapsedSec)},"skipped":$skipsJs,""" +
        s""""fork_skipped":$forkSkJs}"""
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$evidence,"canary":${canaryJson(full)},"stream":$stream,"sink_small_batch":$sinkCmp,"zorder_layout":$layout,"ladder":$ladder,$dl,"sf":"$sfDir"}"""
    }
    // Persist the query timings BEFORE the stream phase: a hung
    // streaming query must not forfeit the 90+ timings already earned.
    persist(jsonLine(noStream, noCmp, noLayout, noLadder))
    // Streaming throughput row (fixed batch count, see StreamBench):
    // runs AFTER the fork phase so its JVM state can't perturb query
    // timings; caches were already dropped above. Bounded wait — a
    // wedged processAllAvailable records eps=-1 instead of hanging the
    // bench; spark.stop()/JVM exit reaps the abandoned attempt.
    // Median of 3 full runs (r11: a single shot recorded 10.1k ev/s in
    // a run whose standalone repeats sat at a stable ~20.5k — the
    // stream row gets the same median discipline as the forked
    // queries; all three eps values go to stderr for the record).
    // Fresh-JVM standalone stream figure: the in-bench eps rides the
    // shared JVM's warm state after the ~160-query sweep (it moved
    // 34.8k -> 31.5k across r11/r12 with ZERO stream-path commits —
    // git-checked — while quiet standalone runs stayed ~20.5-21k both
    // rounds), so the standalone median-of-3 is the number that
    // compares across rounds. Forked exactly like the query forks.
    def forkedStreamEps(): (Double, String) =
      try {
        import scala.jdk.CollectionConverters._
        val javaBin = java.nio.file.Paths.get(
          System.getProperty("java.home"), "bin", "java").toString
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments.asScala.toSeq
        val cmd = Seq(javaBin) ++ jvmArgs ++
          Seq("-cp", System.getProperty("java.class.path"),
            "graft.stream.StreamBench", "25000", "6")
        val pb = new ProcessBuilder(cmd.asJava)
        pb.environment().put("GRAFT_STREAM_WARMRUN", "1")
        // 5 reps with per-rep steal; StreamBench reports the median of
        // the 3 QUIETEST reps so one hypervisor burst stops dragging
        // the cross-round floor (the r15 19.1k-vs-22-32k window swing)
        pb.environment().put("GRAFT_STREAM_REPS", "5")
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val p = pb.start()
        val outBuf = new java.io.ByteArrayOutputStream()
        val drain = new Thread(() =>
          try p.getInputStream.transferTo(outBuf)
          catch { case _: Throwable => () })
        drain.setDaemon(true)
        drain.start()
        val done = p.waitFor(boundedWait(900), java.util.concurrent.TimeUnit.SECONDS)
        if (!done) { p.destroyForcibly(); (-1.0, "[]") }
        else {
          drain.join(10000)
          val text = outBuf.toString
          val Rep =
            """\[stream-bench\] run\d+ sec=[0-9.]+ eps=([0-9.]+) steal=(-?[0-9.]+)""".r
          val reps = Rep.findAllMatchIn(text).toSeq
            .map(m => s"""{"eps":${m.group(1)},"steal":${m.group(2)}}""")
            .mkString("[", ",", "]")
          val Eps = """\[stream-bench\] events=\d+ batches=\d+ sec=[0-9.]+ eps=([0-9.]+)""".r
          (Eps.findAllMatchIn(text).toSeq.lastOption
            .map(_.group(1).toDouble).getOrElse(-1.0), reps)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] standalone stream fork failed: ${e.getMessage}")
        (-1.0, "[]")
      }
    val stream =
      if (!gate("stream", 240)) noStream
      else if (smoke.isDefined) noStream // smoke = sweep-only harness mode
      else try {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        // One UNTIMED full-size warm run first: measured in-bench run
        // sequences ascend (6.0k -> 13.9k -> 27.4k ev/s in one round)
        // as C2 finishes compiling the merge/sink paths — the stream's
        // own small warm batch does not cover them at full batch size,
        // and a median over an ascending sequence under-reports steady
        // state. Then 3 timed runs, median recorded.
        val warm = Await.result(
          Future(graft.stream.StreamBench.run(spark, eventsPerBatch = 25000, batches = 6)),
          boundedWait(300).seconds)
        System.err.println(s"[bench] stream warm eps=${num(warm.eps)}")
        val runs = (1 to 3).map { i =>
          val r = Await.result(
            Future(graft.stream.StreamBench.run(spark, eventsPerBatch = 25000, batches = 6)),
            boundedWait(300).seconds)
          System.err.println(s"[bench] stream run$i eps=${num(r.eps)}")
          r
        }
        val r = runs.sortBy(_.eps).apply(runs.size / 2)
        val (sa, saReps) =
          if (gate("stream_standalone", 150)) forkedStreamEps()
          else (-1.0, "[]")
        System.err.println(s"[bench] stream standalone (fresh JVM, quiet-median of 5) " +
          s"eps=${num(sa)} reps=$saReps")
        s"""{"events":${r.events},"batches":${r.batches},"sec":${num(r.sec)},"events_per_sec":${num(r.eps)},"standalone_eps":${num(sa)},"standalone_reps":$saReps,"note":"events_per_sec rides the shared JVM warm state accumulated by the preceding query sweep (r11->r12 it moved 34.8k->31.5k with zero stream-path commits, git-checked, while quiet standalone runs stayed ~20.5-21k both rounds); standalone_eps is a fresh-JVM median of the 3 lowest-steal of 5 reps after an untimed full-size warm run (per-rep eps+steal in standalone_reps; falls back to a plain median over all reps when the steal probe is unreadable or reps<3 - steal:-1 entries disclose that) and is the cross-round comparable floor"}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] stream bench failed: ${e.getMessage}")
        noStream
      }
    persist(jsonLine(stream, noCmp, noLayout, noLadder))
    // Small-batch write-amplification row, timed at the SINK layer: the
    // streaming harness's ~2 s/trigger fixed cost (JSON normalize,
    // fan-out, scheduling) buries any sink difference locally (measured:
    // COW eps identical with a 12k-row and a 1.6M-row table), so the
    // three layouts are timed directly on identical batches against a
    // pre-seeded table — COW rewrites the world, bucketed rewrites
    // touched buckets (~all, at this batch shape), MOR appends O(batch)
    // with one inline compaction inside the window. Same bounded-wait
    // rule as the stream row.
    val sinkCmp =
      if (!gate("sink_small_batch", 150)) noCmp
      else if (smoke.isDefined) noCmp
      else try {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val r = Await.result(
          Future(graft.sink.SinkBench.run(spark)), boundedWait(600).seconds)
        val curve = r.morReadCurve
          .map { case (c, s) => s"""{"chain":$c,"sec":${num(s)}}""" }
          .mkString("[", ",", "]")
        s"""{"table_rows":${r.tableRows},"batch_rows":${r.batchRows},"commits":${r.commits},""" +
          s""""cow_sec":${num(r.cowSec)},"bucketed_sec":${num(r.bucketedSec)},"mor_sec":${num(r.morSec)},""" +
          s""""cow_read_sec":${num(r.cowReadSec)},"bucketed_read_sec":${num(r.bucketedReadSec)},""" +
          s""""mor_read_sec":${num(r.morReadSec)},"mor_read_chain_len":${r.morChainLen},""" +
          s""""mor_read_curve":$curve}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sink small-batch bench failed: ${e.getMessage}")
        noCmp
      }
    persist(jsonLine(stream, sinkCmp, noLayout, noLadder))
    // Z-order layout row: the measured file-skipping ratio behind the
    // events_zorder_pruned oracle row. Bounded wait like the others.
    val layout =
      if (!gate("zorder_layout", 90)) noLayout
      else if (smoke.isDefined) noLayout
      else try {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val r = Await.result(
          Future(graft.sink.LayoutBench.run(spark, sfDir)), boundedWait(300).seconds)
        s"""{"files_total":${r.filesTotal},"files_read":${r.filesRead},""" +
          s""""rows":${r.rows},"full_sec":${num(r.fullSec)},"pruned_sec":${num(r.prunedSec)}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] zorder layout bench failed: ${e.getMessage}")
        noLayout
      }
    persist(jsonLine(stream, sinkCmp, layout, noLadder))
    // Scale-ladder rungs LAST (the slowest phase; every earlier number
    // is already persisted if it wedges): headline queries timed at 1x
    // and Fx generated data, exponent per query — the measured form of
    // the "would this survive 10x" claim. Storm-proofing (the r14
    // rc=124 lesson) is three layers deep: every completed rung
    // re-persists a parseable partial artifact (onRung), each rung
    // carries its own wall budget (job-group cancel -> t=-1/null), and
    // the ladder self-deadlines so remaining rungs degrade to disclosed
    // SKIPPED rows; the Await stays as the outermost backstop and a
    // timeout keeps the LAST PARTIAL instead of discarding the ladder.
    val factor = sys.env.getOrElse("GRAFT_LADDER_FACTOR", "10").toInt
    @volatile var ladderPartial = noLadder
    val ladder =
      if (!gate("ladder", 180)) noLadder
      else if (smoke.isDefined) noLadder
      else try {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        // The ladder gets whatever the global budget has left (minus a
        // persist+print reserve), never more than its own 2100 s env
        // default; its internal deadline degrades remaining rungs to
        // disclosed SKIPPED rows. The Await backstop sits above the
        // in-flight rung's budget — the deadline layers are the real
        // bounds, the Await only catches a wedged driver.
        val ladderBudget =
          math.min(sys.env.getOrElse("GRAFT_LADDER_DEADLINE_SEC", "2100").toDouble,
            math.max(60.0, remainingSec - 120.0))
        val rungs = Await.result(
          Future(ScaleLadder.run(spark, sfDir, factor, onRung = rs => {
            ladderPartial = ScaleLadder.toJson(factor, rs, partial = true)
            persist(jsonLine(stream, sinkCmp, layout, ladderPartial))
          }, deadlineSecOverride = Some(ladderBudget))),
          boundedWait(3000).seconds)
        ScaleLadder.toJson(factor, rungs)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scale ladder failed (keeping the " +
          s"last partial, ${ladderPartial.length} chars): ${e.getMessage}")
        ladderPartial
      }
    persistWith(jsonLine(stream, sinkCmp, layout, ladder), terminal = true)
    spark.stop()
    // The one-line JSON is the LAST stdout line of the process — after
    // spark.stop() so no shutdown logging trails it, flushed so the
    // driver's stdout-tail capture sees it unmingled (BENCH_r14/r15
    // were rc=0 but parsed:null because the line reached the driver
    // through sbt's logger stream; build.sbt now passes forked stdout
    // through verbatim via OutputStrategy.StdoutOutput).
    System.out.println(jsonLine(stream, sinkCmp, layout, ladder, full = false))
    System.out.flush()
  }
}
