package graft.queries

import graft.ext.{Dedup, Dsir, Ivf, LineDedup, Multimodal, NgramLm, PiiRedact, Pq, Sampling, SemDedup, Similarity, SpanDedup, TextStats, UrlOps, Warc, Winnowing}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline queries over `documents` / `embeddings`
  * (SURVEY.md §2.8 north star; fixtures per FIXTURES.md §B). */
object LlmQueries {

  // widen(): the corpus ships as single-row-group parquet (one input
  // split), so every downstream explode/parse stage would otherwise run
  // single-threaded — see graft.util.ScanParallelism (guide §2.5);
  // a no-op whenever the scan already plans >= cores partitions.
  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.ScanParallelism.widen(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")

  /** UN-widened corpus reader for ARRIVING-SHARD arguments of the
    * incremental rows whose timed body fingerprints/appends a tiny
    * trigger batch (llm_simhash_incremental, llm_bm25_incremental —
    * the two disclosed r16 widen-tax rows, +0.4 s each): widening a
    * 500-row batch pays the exchange plus cores-many write tasks for
    * parallelism the probe never uses. Production-correct shape too: a
    * trigger batch arrives with the SOURCE's partitioning, it is not a
    * fat single-split file scan — the index-build side (scan-bound over
    * the full corpus) keeps the widened reader. */
  private def docsShard(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // emb() is NOT widened at the reader: most embedding consumers are
  // index-probe queries over a small batch, and the added exchange is a
  // measured tax there (llm_cosine_topk_pq 1.16 → 1.51 s,
  // llm_semdedup_incremental 0.71 → 1.07 s forked A/B). The heavy
  // pair-generation consumers opt in via [[embWide]].
  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Widened embeddings for the CPU-heavy pair-generation family (LSH
    * candidate explode + exact-cosine verification): single-row-group
    * parquet plans one split, so those stages are otherwise
    * single-threaded (guide §2.5; measured llm_cosine_neardup
    * 2.93 → 1.26 s forked A/B). No-op when the scan already plans
    * >= cores partitions. */
  private def embWide(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.ScanParallelism.widen(emb(spark, sfDir), "vec_id")

  /** Exact dedup: survivors (min doc_id) per distinct text + copy count.
    * The engine groups on a sha256 digest (fixed-width shuffle key); the
    * output keys are the surviving ids, oracle-checkable without the
    * digest. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(docs(spark, sfDir), "doc_id", "text")
      .select(col("doc_id"), col("n_copies"))
      .orderBy("doc_id")

  /** Hot-shingle document-frequency cap for the registered Jaccard
    * queries. A near-universal shingle (license boilerplate, shared
    * header) otherwise makes its inverted-index bucket quadratic — the
    * classic skewed-key shuffle at 100 TB. 50 caps the worst bucket at
    * ~1.2k pairs per shingle while binding NOTHING on the test corpus
    * (measured max df: 9 / 7 / 25 at sf0.001 / 0.01 / 0.1), so the
    * oracle values are unchanged; the DuckDB CTE applies the same cap. */
  val JaccardMaxDf = 50L

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join (never
    * all-pairs, df-capped per [[JaccardMaxDf]]). Low threshold so the
    * word-soup corpus yields pairs. */
  def nearDupJaccard(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairs(docs(spark, sfDir), "doc_id", "text", n = 3,
        threshold = 0.12, maxDf = JaccardMaxDf)
      .orderBy("id_a", "id_b")

  /** High-threshold ("these are the same document") near-dup setting
    * for the prefix-filter family: 0.8 is the regime production
    * near-dup dedup runs at, and the regime the AllPairs prefix filter
    * is FOR — the prefix keeps only `|d|-ceil(0.8|d|)+1` ≈ 20% of each
    * doc's shingles, so the candidate stream collapses ~(1-t)²
    * (measured at sf0.1: 43.5k candidate pairs vs the full inverted
    * index's 1.27M — 29×; wall-clock 2.0 s vs 3.1 s uncapped). At the
    * low exploratory threshold 0.12 the same filter keeps 88% of
    * shingles and its two extra shuffles cost more than the 1.4×
    * candidate reduction buys (measured 8.9 s vs 2.1 s) — threshold
    * decides the plan, which is why both operators exist. No df cap on
    * this family: the prefix filter REPLACES the cap's recall sacrifice
    * (a near-universal shingle is the globally most frequent, so it
    * sorts to the END of every doc's rarity order and never enters a
    * prefix at high t). */
  val JaccardHiThreshold = 0.8

  /** Prefix-filtered exact Jaccard (AllPairs, Bayardo et al. WWW'07) at
    * the production threshold, uncapped (see
    * [[Dedup.jaccardPairsPrefix]] and [[JaccardHiThreshold]]). Gated on
    * the IDENTICAL oracle SQL as [[nearDupJaccardHiFull]] — the
    * losslessness proof. */
  def nearDupJaccardPrefix(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairsPrefix(docs(spark, sfDir), "doc_id", "text", n = 3,
        threshold = JaccardHiThreshold)
      .orderBy("id_a", "id_b")

  /** The full-inverted-index twin of [[nearDupJaccardPrefix]] — same
    * threshold, same (absent) cap, same oracle: both algorithms must
    * equal the DuckDB ground truth byte-for-byte. */
  def nearDupJaccardHiFull(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.jaccardPairs(docs(spark, sfDir), "doc_id", "text", n = 3,
        threshold = JaccardHiThreshold)
      .orderBy("id_a", "id_b")

  /** The prefix filter's measured candidate reduction at the production
    * threshold: distinct co-shingled pairs under the full inverted
    * index vs under the prefix index (post length-filter) vs final
    * qualifying pairs — a single row; the oracle recomputes all three
    * from the same window definitions. */
  def prefixCandidateStats(spark: SparkSession, sfDir: String): DataFrame = {
    // NOT staged (measured r17): the shingle stream feeds 4 consumers,
    // but it is a map-side scan+explode that recomputes in parallel for
    // ~nothing, while a checkpoint must materialize every (id, shingle)
    // string row up front — A/B 2.9 s -> 3.6 s at sf0.1/8c. §2.4's
    // stage rule pays off for subtrees with shuffles/joins inside
    // (cleanCorpus pairs), not for cheap wide map-side streams.
    val sh = Dedup.shingles(docs(spark, sfDir), "doc_id", "text", 3)
    val full = sh.select(col("doc_id").as("id_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), "shingle")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .agg(count(lit(1)).as("full_cands"))
    val pre = Dedup.prefixCandidates(
        Dedup.prefixShingles(sh, "doc_id", JaccardHiThreshold),
        "doc_id", JaccardHiThreshold)
      .agg(count(lit(1)).as("prefix_cands"))
    val out = nearDupJaccardPrefix(spark, sfDir)
      .agg(count(lit(1)).as("pairs_out"))
    // Single-row scalar joins (the disclosed bounded-crossJoin pattern).
    full.crossJoin(pre).crossJoin(out)
  }

  /** C4 fixture corpus: the single-line word-soup docs restructured
    * into [[LineW]]-word lines with DETERMINISTIC decorations keyed on
    * (doc_id, line_idx) — terminal punctuation on a (doc+line)%4 cycle,
    * a planted "javascript" line on the %4==3 arm, and page-level
    * "lorem ipsum" / curly-brace markers on doc_id%17 / %19 — so the
    * C4 rules have real selectivity in BOTH directions (disclosed
    * adapter; the oracle replays the identical decoration). Fully
    * map-side: the line assembly is one transform over the word array,
    * no explode/shuffle. */
  private def c4Docs(spark: SparkSession, sfDir: String): DataFrame = {
    val wsc = col("__w")
    val arm = (i: org.apache.spark.sql.Column) => (col("doc_id") + i + 1) % 4
    docs(spark, sfDir)
      .select(col("doc_id"), TextStats.words(lower(col("text"))).as("__w"))
      .where(size(wsc) >= 1 && !(size(wsc) === 1 && element_at(wsc, 1) === ""))
      .select(col("doc_id"), concat(
        array_join(
          transform(sequence(lit(0), floor((size(wsc) - 1) / LineW).cast("int")),
            i => concat(concat_ws(" ", slice(wsc, i * LineW + 1, lit(LineW))),
              when(arm(i) === 0, lit("."))
                .when(arm(i) === 1, lit("?"))
                .when(arm(i) === 2, lit(""))
                .otherwise(lit(" javascript.")))),
          "\n"),
        when(col("doc_id") % 17 === 0, lit("\nlorem ipsum dolor sit."))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0, lit("\nconfig { block }."))
          .otherwise(lit(""))).as("text"))
  }

  /** C4 heuristic page cleaning over the decorated fixture (see
    * [[graft.ext.C4Clean.clean]]; minLines=2 because the fixture's docs
    * are 3-6 lines — the C4 paper's 5 is the production default). */
  def c4Clean(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.C4Clean.clean(c4Docs(spark, sfDir), "doc_id", "text",
        minWordsPerLine = 3, minLines = 2)
      .orderBy("doc_id")

  /** One-row corpus audit of the C4 rules (see
    * [[graft.ext.C4Clean.stats]]). */
  def c4Stats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.C4Clean.stats(c4Docs(spark, sfDir), "doc_id", "text",
      minWordsPerLine = 3, minLines = 2)

  /** Blocklist fixture: two vocabulary words (so the filter bites) and
    * one absent term (so the no-hit arm is exercised — it must simply
    * produce no stats row, not a zero). */
  val BlocklistTerms = Seq("slow", "vector", "spam")

  private def blocklistDf(spark: SparkSession): DataFrame = {
    val s = spark; import s.implicits._
    BlocklistTerms.toDF("term")
  }

  /** Token-exact blocklist page filter (see
    * [[graft.ext.C4Clean.blocklistFilter]] — broadcast terms join, one
    * anti-join). */
  def blocklistFilter(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.C4Clean.blocklistFilter(docs(spark, sfDir), "doc_id", "text",
        blocklistDf(spark))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** Per-term flagged-doc counts (terms with zero hits yield no row —
    * the oracle agrees). */
  def blocklistStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.C4Clean.blocklistHits(docs(spark, sfDir), "doc_id", "text",
        blocklistDf(spark))
      .groupBy("term").agg(count(lit(1)).as("docs_flagged"))
      .orderBy("term")

  /** Span window width for the registered span-dedup queries: 12 words
    * — long enough that the ~40-word fixture vocabulary cannot repeat a
    * window by chance (40^-12 per pair), short enough that mutated
    * near-duplicate documents still share runs. Lee et al. 2022 use 50
    * BPE tokens at web scale; the knob is the operator's `w`. */
  val SpanW = 12

  /** Exact substring (span-level) dedup — per-doc maximal duplicated
    * spans (see [[SpanDedup]]; fingerprint-bucketed, never shuffles
    * window text). */
  def spanDedup(spark: SparkSession, sfDir: String): DataFrame =
    SpanDedup.spans(docs(spark, sfDir), "doc_id", "text", w = SpanW)
      .orderBy("doc_id", "span_start")

  /** Corpus summary of duplicated-span mass (the number an operator
    * reads before deciding to cut spans corpus-wide). */
  def spanDedupStats(spark: SparkSession, sfDir: String): DataFrame =
    SpanDedup.stats(docs(spark, sfDir), "doc_id", "text", w = SpanW)

  /** The span-dedup REWRITE: every duplicated span occurrence cut
    * except the lexicographically first (see [[SpanDedup.cut]]). */
  def spanDedupCut(spark: SparkSession, sfDir: String): DataFrame =
    SpanDedup.cut(docs(spark, sfDir), "doc_id", "text", w = SpanW)
      .orderBy("doc_id")

  /** "Line" width for the registered line-dedup queries: the fixture
    * corpus is single-line word soup, so lines are 10-word chunks via
    * [[LineDedup.chunkLines]] — the same machinery a newline split
    * feeds on real web text (disclosed adapter, oracle uses the
    * identical chunking). 10 is below [[SpanW]] on purpose: planted
    * near-dup runs then span multiple aligned chunks. */
  val LineW = 10

  /** A line in >= this many DISTINCT docs is boilerplate (CCNet uses
    * shard-relative thresholds; 2 is the strictest cross-doc form and
    * the fixture corpus has ~130 such chunk-lines). */
  val LineMinDocs = 2

  private def chunkLines(spark: SparkSession, sfDir: String): DataFrame =
    LineDedup.chunkLines(docs(spark, sfDir), "doc_id", "text", LineW)

  /** Corpus line-frequency audit (read before a corpus-wide rewrite). */
  def lineDedupStats(spark: SparkSession, sfDir: String): DataFrame =
    LineDedup.stats(chunkLines(spark, sfDir), "doc_id", LineMinDocs)

  /** CCNet boilerplate drop: documents rewritten with every cross-doc
    * repeated line removed (see [[LineDedup.dropBoilerplate]]). */
  def lineDedupBoilerplate(spark: SparkSession, sfDir: String): DataFrame =
    LineDedup.dropBoilerplate(docs(spark, sfDir), "doc_id", "text",
        chunkLines(spark, sfDir), LineMinDocs)
      .orderBy("doc_id")

  /** Strict global line dedup: every repeated line cut except its first
    * (doc_id, line_idx) occurrence (see [[LineDedup.dedupLines]]). */
  def lineDedupFirst(spark: SparkSession, sfDir: String): DataFrame =
    LineDedup.dedupLines(docs(spark, sfDir), "doc_id", "text",
        chunkLines(spark, sfDir))
      .orderBy("doc_id")

  /** Fixture adapter for the PII queries: the word-soup corpus contains
    * no PII (verified: zero matches for any pattern), so emails / IPv4s
    * / phones are PLANTED deterministically from doc_id — the oracle
    * SQL performs the identical construction, so redaction itself is
    * what the gate tests. doc_id % 2 alternates the two NANP phone
    * shapes so both regex branches are exercised. */
  private def piiDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    def mod(m: Int) = (id % m).cast("string")
    docs(spark, sfDir).select(id, concat(
      col("text"),
      when(id % 3 === 0,
        concat(lit(" contact u"), id.cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" from 10."), mod(250), lit(".0."), mod(200)))
        .otherwise(lit("")),
      when(id % 7 === 0, concat(lit(" call "),
        when(id % 2 === 0, lit("(415) 555-")).otherwise(lit("415-555-")),
        lpad(mod(10000), 4, "0")))
        .otherwise(lit(""))).as("text"))
  }

  /** Dolma-style PII masking: redacted corpus + per-doc detection
    * counts (see [[PiiRedact.redactDocs]] — one map-side projection). */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame =
    PiiRedact.redactDocs(piiDocs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** One-row corpus PII audit (see [[PiiRedact.stats]]). */
  def piiStats(spark: SparkSession, sfDir: String): DataFrame =
    PiiRedact.stats(piiDocs(spark, sfDir), "doc_id", "text")

  /** Session-cached line-frequency index over the existing-corpus split
    * (doc_id % 10 != 0), bucketed so the gated query exercises the
    * partition-pruned probe. */
  private def lineIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"line|$sfDir") { dir =>
      graft.ext.IncrementalLineDedup.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, lineW = LineW, minDocs = LineMinDocs,
        lineBuckets = 16)
    }

  /** Incremental boilerplate drop: the arriving shard rewritten against
    * `indexed ∪ shard` line frequencies via the persisted index —
    * live-oracled as the full recompute restricted to shard docs. */
  def lineDedupIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalLineDedup.dropBoilerplate(spark,
        lineIncIndexDir(spark, sfDir),
        docs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "text")
      .orderBy("doc_id")

  /** DSIR target/raw split: the `lang = 'en'` slice plays the quality
    * target corpus, everything else the raw pool being selected from —
    * the common "select web data that looks like my curated set"
    * deployment. */
  private def dsirTarget(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).where(col("lang") === "en")
  private def dsirRaw(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).where(col("lang") =!= "en")

  /** DSIR importance scores for every raw document (integer-bit
    * quantized; see [[Dsir]]) — live-oracled bit-for-bit. */
  def dsirScore(spark: SparkSession, sfDir: String): DataFrame =
    Dsir.score(dsirTarget(spark, sfDir), dsirRaw(spark, sfDir),
      "doc_id", "text").orderBy("doc_id")

  /** DSIR selection: the 50 most target-like raw documents under the
    * deterministic (score DESC, id) order. */
  def dsirSelect(spark: SparkSession, sfDir: String): DataFrame =
    Dsir.select(dsirTarget(spark, sfDir), dsirRaw(spark, sfDir),
      "doc_id", "text", k = 50).orderBy("doc_id")

  /** Fixture adapter for the URL queries: the corpus has no URL column
    * (in production it arrives as the `WARC-Target-URI` parsed by
    * [[Warc.wetDocs]]), so a deliberately MESSY url is derived
    * deterministically from (doc_id, source) — the oracle performs the
    * identical construction, so canonicalization itself is what the
    * gate tests. Every [[UrlOps.canonicalize]] rule is exercised:
    * mixed-case scheme/host, default (`:80`/`:443`) and non-default
    * (`:8080`) ports, a `www.`/`WWW.` label, tracking params in
    * leading/middle/trailing position, an all-tracking query, a
    * trailing path slash, and a fragment; tlds rotate through plain
    * (`com`/`org`/`net`) and two-label-suffix (`co.uk`/`com.au`)
    * registries so both eTLD+1 branches run. */
  private def urlDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    val idS = id.cast("string")
    val scheme = when(id % 4 === 0, "HTTP://")
      .when(id % 4 === 1, "HTTPS://").otherwise("https://")
    val hostCore = when(id % 3 === 0, concat(lit("WWW."), upper(col("source"))))
      .when(id % 3 === 1, concat(lit("www."), col("source")))
      .otherwise(col("source"))
    val tld = when(id % 5 === 0, ".co.uk").when(id % 5 === 1, ".org")
      .when(id % 5 === 2, ".com").when(id % 5 === 3, ".net")
      .otherwise(".com.au")
    val port = when(id % 7 === 0, when(id % 4 === 0, ":80").otherwise(":443"))
      .when(id % 11 === 0, ":8080").otherwise("")
    val path = concat(lit("/Doc/"), idS, when(id % 6 === 0, "/").otherwise(""))
    val query = when(id % 9 === 0, concat(lit("?utm_source=feed&id="), idS))
      .when(id % 9 === 1, concat(lit("?id="), idS, lit("&utm_campaign=x")))
      .when(id % 9 === 2, "?utm_a=1&utm_b=2")
      .when(id % 9 === 3, "?a=1&utm_medium=m&b=2")
      .otherwise("")
    val frag = when(id % 8 === 0, "#Section-2").otherwise("")
    docs(spark, sfDir).select(id, col("n_chars"),
      concat(scheme, hostCore, tld, port, path, query, frag).as("url"))
  }

  /** URL canonicalization + host + eTLD+1 per document (see
    * [[UrlOps]] — one map-side codegen'd projection, no shuffle). */
  def urlNormalize(spark: SparkSession, sfDir: String): DataFrame =
    urlDocs(spark, sfDir)
      .select(col("doc_id"), col("url"),
        UrlOps.canonicalize(col("url")).as("url_canon"))
      .withColumn("host", UrlOps.host(col("url_canon")))
      .withColumn("domain", UrlOps.registeredDomain(col("host")))
      .orderBy("doc_id")

  private def urlDomainDocs(spark: SparkSession, sfDir: String): DataFrame =
    urlDocs(spark, sfDir).withColumn("domain",
      UrlOps.registeredDomain(UrlOps.host(UrlOps.canonicalize(col("url")))))

  /** Deterministic best-first order for the domain cap: longest doc
    * wins, doc_id breaks ties (total — doc_id is unique). */
  private def domainOrd = Seq(col("n_chars").desc, col("doc_id"))

  val DomainCapN = 3

  /** FineWeb per-domain frequency cap: at most [[DomainCapN]] docs per
    * registered domain, best-first under [[domainOrd]] — the skew-safe
    * two-phase form of [[UrlOps.capPerDomain]], gated against the
    * oracle's single `row_number()` window. */
  def domainCap(spark: SparkSession, sfDir: String): DataFrame =
    UrlOps.capPerDomain(urlDomainDocs(spark, sfDir), col("domain"),
        domainOrd, cap = DomainCapN)
      .select("doc_id", "domain", "n_chars")
      .orderBy("doc_id")

  /** Per-domain corpus audit: raw contribution vs post-cap survivors —
    * the report a 100 TB operator reads to see which SEO farms the cap
    * actually bit. One full hash-agg plus the capped agg, joined on the
    * (low-cardinality) domain key. */
  def domainStats(spark: SparkSession, sfDir: String): DataFrame = {
    val base = urlDomainDocs(spark, sfDir)
    val kept = UrlOps.capPerDomain(base, col("domain"), domainOrd, cap = DomainCapN)
      .groupBy("domain")
      .agg(count("*").as("n_kept"), sum("n_chars").as("chars_kept"))
    base.groupBy("domain").agg(count("*").as("n_docs"))
      .join(kept, Seq("domain"))
      .select(col("domain"), col("n_docs"), col("n_kept"), col("chars_kept"))
      .orderBy("domain")
  }

  /** First-come admission cap for the incremental twin: sized against
    * the ~22-per-domain existing split so the shard sees a real
    * admit/reject mix at sf0.01 (40 admitted / 10 rejected, measured —
    * all-reject or all-admit would gate nothing). */
  val DomainAdmitCap = 20

  /** Session-cached kept-count index over the existing-corpus split
    * (doc_id % 10 != 0), bucketed so the gated query exercises the
    * partition-pruned probe. */
  private def domainIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"domaincap|$sfDir") { dir =>
      graft.ext.IncrementalDomainCap.writeIndex(
        urlDomainDocs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "domain", dir, cap = DomainAdmitCap, buckets = 16)
    }

  /** Incremental per-domain admission: the arriving shard judged
    * against the persisted budget via first-come semantics —
    * live-oracled as the first-come cap over `indexed ∪ shard`
    * restricted to shard docs (see [[graft.ext.IncrementalDomainCap]]). */
  def domainCapIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalDomainCap.admit(spark,
        domainIncIndexDir(spark, sfDir),
        urlDomainDocs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "domain")
      .orderBy("doc_id")

  /** Synthetic link graph over the dense doc_id space [0, N): three
    * out-edges per doc — a quadratic scatter ((i²+1) mod N), a hub
    * family (i mod 97: the first 97 docs collect ~N/97 in-links each),
    * and an affine permutation ((7i+3) mod N) keeping everything
    * reachable. In-degrees are deliberately heterogeneous so ranks
    * genuinely vary (a regular graph converges to uniform and gates
    * nothing); every node has out-degree 3 so no dangling-mass leak.
    * N arrives via the single-row scalar-join pattern, never a collect. */
  private def linkEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id"))
    val cnt = d.agg(count(lit(1)).as("cnt"))
    d.crossJoin(cnt).select(col("doc_id").as("src"),
      explode(array(
        (col("doc_id") * col("doc_id") + 1) % col("cnt"),
        col("doc_id") % 97,
        (col("doc_id") * 7 + 3) % col("cnt"))).as("dst"))
  }

  /** Fixed-point PageRank over the link graph, 10 synchronous
    * iterations — bit-exact across engines by integer-only arithmetic
    * (see [[graft.ext.PageRank]]); fully live DuckDB oracle (the same
    * iteration as 10 chained CTEs). */
  def pagerank(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.PageRank.ranks(linkEdges(spark, sfDir), "src", "dst",
        iters = 10)
      .select(col("node").as("doc_id"), col("rank_micros"))
      .orderBy("doc_id")

  /** Mass-conserving PageRank over a graph with REAL dangling nodes
    * (docs ≡ 0 mod 13 emit no out-edges but keep their in-links): the
    * per-round dangling-mass redistribution, bit-exact against the
    * oracle's chained-CTE restatement of the same integer arithmetic
    * (see [[graft.ext.PageRank]] `redistributeDangling`). */
  def pagerankDangling(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.PageRank.ranks(
        linkEdges(spark, sfDir).where(col("src") % 13 =!= 0),
        "src", "dst", iters = 10, redistributeDangling = true)
      .select(col("node").as("doc_id"), col("rank_micros"))
      .orderBy("doc_id")

  /** Warm-start (incremental) PageRank: ranks converged on the
    * already-crawled subgraph (docs with `doc_id % 10 != 0` as
    * sources, 10 cold rounds), then a crawl refresh adds the remaining
    * docs' out-edges and the iteration RESUMES from the stored vector
    * for 4 rounds instead of restarting cold — the incremental twin of
    * `llm_pagerank` (see [[graft.ext.PageRank.ranksFrom]]). The cold
    * phase is mass-conserving (`redistributeDangling`): the
    * not-yet-crawled docs dangle in the old graph, and letting them
    * leak depresses the whole stored vector — PageRankSpec shows a
    * low-mass warm start can be FARTHER from the fixed point than
    * uniform init. Bit-exact live oracle: the same 10-then-4 integer
    * chain as CTEs, dangling correction included. */
  def pagerankWarm(spark: SparkSession, sfDir: String): DataFrame = {
    val all = linkEdges(spark, sfDir)
    val old = all.where(col("src") % 10 =!= 0)
    val init = graft.ext.PageRank.ranks(old, "src", "dst", iters = 10,
      redistributeDangling = true)
    graft.ext.PageRank.ranksFrom(all, "src", "dst",
        init, "node", "rank_micros", iters = 4)
      .select(col("node").as("doc_id"), col("rank_micros"))
      .orderBy("doc_id")
  }

  /** Training-shuffle shard count / seed (also interpolated into the
    * oracle SQL so both engines run the same affine permutation). */
  val ShuffleShards = 8
  val ShuffleSeed = 12L

  /** Deterministic seeded shuffle into training shards: every doc's
    * (shard, position) from the affine key permutation — no rand(), no
    * global sort (see [[graft.ext.ShardShuffle]]); fully live oracle. */
  def shuffleShards(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.ShardShuffle.shuffleToShards(docs(spark, sfDir), "doc_id",
        nShards = ShuffleShards, seed = ShuffleSeed)
      .select(col("doc_id"), col("shard"), col("pos_in_shard"))
      .orderBy("doc_id")

  /** Shard balance/contiguity audit over the same shuffle. */
  def shuffleStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.ShardShuffle.shardStats(docs(spark, sfDir), "doc_id",
        nShards = ShuffleShards, seed = ShuffleSeed)
      .orderBy("shard")

  /** The word-soup fixture is pure ASCII (NFC-invariant), so — like the
    * PII row — every doc gets a deterministic DENORMALIZED suffix
    * planted from doc_id: composition (e+◌́), singleton (Å U+212B),
    * canonical reordering (q+◌̇+◌̣), decompose-recompose (ḋ+◌̣), and
    * Hangul jamo — one exemplar per NFC rule family. The oracle plants
    * the identical suffix with chr() and normalizes with DuckDB's
    * utf8proc `nfc_normalize`, so the hash gate proves the JVM and
    * utf8proc normalizers agree byte-for-byte on every family. */
  private def nfcDocs(spark: SparkSession, sfDir: String): DataFrame = {
    // Explicit \\u escapes, not literal glyphs: a toolchain normalizing
    // this source file must not be able to silently compose the fixture.
    val suffixes = Seq(
      "e\u0301",            // composition: e + combining acute
      "A\u030a",            // composition: A + combining ring
      "\u212b",             // singleton: Angstrom sign -> U+00C5
      "q\u0307\u0323",      // canonical reordering: ccc 230 planted before 220
      "\u1e0b\u0323",       // decompose-recompose: d-dot-above + dot-below
      "\u1100\u1161\u11a8") // Hangul jamo -> one syllable
    docs(spark, sfDir).select(col("doc_id"), concat(col("text"), lit(" "),
      element_at(array(suffixes.map(lit): _*),
        (col("doc_id") % 6).cast("int") + 1)).as("text"))
  }

  /** Unicode NFC normalization over the planted corpus (see
    * [[graft.functions.NfcExpressions]]) — per-doc normalized text,
    * change flag, and codepoint lengths; fully live oracle. */
  /** Snapshot-diff fixture: v1 drops every 7th doc, v2 drops every 13th
    * and appends a marker to every 11th — so all four statuses occur at
    * every gated scale factor. */
  private def snapOld(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).where(col("doc_id") % 7 =!= 0)
  private def snapNew(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).where(col("doc_id") % 13 =!= 0)
      .withColumn("text", when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))

  /** Corpus snapshot diff (see [[graft.ext.SnapshotDiff]]): per-doc
    * added/removed/changed/unchanged between the two fixture versions.
    * The engine classifies from map-side SHA-256 digests (text never
    * shuffles); the oracle classifies from the text itself — a green
    * hash proves the digest shortcut changes nothing. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.SnapshotDiff.diff(snapOld(spark, sfDir),
        snapNew(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** Release-notes rollup of the same diff. */
  def snapshotDiffStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.SnapshotDiff.diffStats(snapOld(spark, sfDir),
        snapNew(spark, sfDir), "doc_id", "text")
      .orderBy("status")

  /** Session-cached content-state index over the v1 snapshot, bucketed
    * so the gated query exercises the partition-pruned probe. */
  private def snapIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"snap|$sfDir") { dir =>
      graft.ext.IncrementalSnapshotDiff.writeIndex(
        snapOld(spark, sfDir), "doc_id", "text", dir, buckets = 16)
    }

  /** Incremental diff: an arriving v2 shard (every 10th doc, with the
    * v2 mutation) classified against the persisted v1 state (see
    * [[graft.ext.IncrementalSnapshotDiff]]) — live-oracled as the full
    * diff restricted to shard ids. */
  def snapshotDiffIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val shard = docs(spark, sfDir).where(col("doc_id") % 10 === 0)
      .withColumn("text", when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
    graft.ext.IncrementalSnapshotDiff.diffBatch(spark,
        snapIncIndexDir(spark, sfDir), shard, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Val-split size (ppm) for the split-leakage audit: the standard
    * 10% held-out fraction, selected by [[graft.ext.Sampling.bucket]]
    * so the split is reproducible on any engine/cluster/retry. */
  val ValPpm = 100000L

  private def isVal(c: org.apache.spark.sql.Column) =
    graft.ext.Sampling.bucket(c) < ValPpm

  /** Train/val split-leakage audit — the eval-hygiene check that a
    * held-out document is a near-copy of a training document (Lee et
    * al. 2022 report duplicated-across-split examples memorized
    * verbatim): the deterministic key-hash split, then every near-dup
    * pair (the session-shared capped Jaccard-0.5 set [[cappedPairs]] —
    * no new shuffle work if the dedup family already ran) that CROSSES
    * the split, reported as (val_doc, train_doc, jaccard). Fully live
    * oracle over the same pair CTE. */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame =
    cappedPairs(spark, sfDir)
      .where(isVal(col("id_a")) =!= isVal(col("id_b")))
      .select(
        when(isVal(col("id_a")), col("id_a")).otherwise(col("id_b"))
          .as("val_doc"),
        when(isVal(col("id_a")), col("id_b")).otherwise(col("id_a"))
          .as("train_doc"),
        col("jaccard"))
      .orderBy("val_doc", "train_doc")

  /** Split audit rollup: per-split doc/char counts plus how many of its
    * docs appear in a cross-split leak pair. */
  def splitStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(
      when(isVal(col("doc_id")), "val").otherwise("train").as("split"),
      col("n_chars"))
    val lk = splitLeakage(spark, sfDir)
    val leaked = lk.select(col("val_doc").as("doc_id"), lit("val").as("split"))
      .union(lk.select(col("train_doc").as("doc_id"), lit("train").as("split")))
      .distinct()
      .groupBy("split").agg(count(lit(1)).as("n_leak_docs"))
    d.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars_sum"))
      .join(leaked, Seq("split"), "left")
      .na.fill(0L, Seq("n_leak_docs"))
      .orderBy("split")
  }

  /** Leakage-FREE split constructor — the fix the [[splitLeakage]]
    * audit motivates: split by near-dup CONNECTED COMPONENT instead of
    * by document, so an entire near-dup cluster lands on one side and
    * no qualifying pair can ever cross (Lee et al. 2022's
    * memorized-eval-example failure is structurally impossible). Each
    * doc hashes on `coalesce(component_min_id, doc_id)` with the same
    * engine-reproducible Knuth bucket as the naive split.
    *
    * Scale shape: CC runs only over the pair GRAPH (bounded by near-dup
    * pair count, not corpus size — isolated docs never enter the
    * iteration); the split itself is one left join against the bounded
    * comp table + a map-side hash. */
  def splitSafe(spark: SparkSession, sfDir: String): DataFrame =
    splitSafeRaw(spark, sfDir).orderBy("doc_id")

  /** The split WITHOUT the presentation sort — [[splitSafeStats]]
    * consumes it three times (two leak-pair joins + the count agg), so
    * forcing a sort under those shuffles would be wasted work. */
  private def splitSafeRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = Dedup.connectedComponents(cappedPairs(spark, sfDir))
      .withColumnRenamed("id", "doc_id")
    docs(spark, sfDir)
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(graft.ext.Sampling.bucket(
            coalesce(col("comp"), col("doc_id"))) < ValPpm, lit("val"))
          .otherwise(lit("train")).as("split"))
  }

  /** One-row proof the constructed split is leak-free: per-split doc
    * counts plus the number of qualifying pairs that cross — computed
    * LIVE on both engines (the oracle re-derives components, split,
    * and crossing count independently; 0 = 0 is the gate). */
  def splitSafeStats(spark: SparkSession, sfDir: String): DataFrame = {
    // Materialize the split ONCE: the plan below consumes `sp` three
    // times (both sides of the leak-pair join + the count agg), and an
    // unstaged split would re-run its docs-scan + component join per
    // consumer (guide §2.4 — the three consumers now read one
    // checkpointed table; the presentation sort is skipped entirely).
    val sp = graft.util.Checkpoints.stage(splitSafeRaw(spark, sfDir))
    val leak = cappedPairs(spark, sfDir)
      .join(sp.select(col("doc_id").as("id_a"), col("split").as("__sa")), "id_a")
      .join(sp.select(col("doc_id").as("id_b"), col("split").as("__sb")), "id_b")
      .where(col("__sa") =!= col("__sb"))
      .agg(count(lit(1)).as("leak_pairs"))
    val counts = sp.agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
    // single-row scalar join (the disclosed bounded-crossJoin pattern)
    counts.crossJoin(leak)
  }

  def nfcNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    val norm = graft.functions.NfcExpressions.nfc(col("text"))
    nfcDocs(spark, sfDir).select(
        col("doc_id"),
        norm.as("norm_text"),
        length(col("text")).cast("long").as("len_raw"),
        length(norm).cast("long").as("len_norm"),
        (norm =!= col("text")).as("changed"))
      .orderBy("doc_id")
  }

  /** Accent folding over the same planted corpus (see
    * [[graft.functions.NfcExpressions.stripAccents]]) — the oracle's
    * `strip_accents` restates the NFD→STRIPMARK→NFC chain exactly. */
  def stripAccents(spark: SparkSession, sfDir: String): DataFrame = {
    val st = graft.functions.NfcExpressions.stripAccents(col("text"))
    nfcDocs(spark, sfDir).select(
        col("doc_id"),
        st.as("stripped"),
        length(col("text")).cast("long").as("len_raw"),
        length(st).cast("long").as("len_stripped"))
      .orderBy("doc_id")
  }

  /** JSONL container round-trip: corpus → one-JSON-object-per-line
    * files (Dolma/RedPajama layout) → explicit-schema FAILFAST parse →
    * corpus. The oracle reads the original table, so a green hash
    * proves serialization + escaping + line framing byte-exactly (see
    * [[graft.ext.Jsonl]]). */
  private def jsonlRoundtrip(spark: SparkSession, sfDir: String,
                             codec: String): DataFrame = {
    val files = graft.ext.Jsonl.synthesize(spark, docs(spark, sfDir),
      "doc_id", WarcDocsPerFile, codec = codec)
    graft.ext.Jsonl.docs(spark, files, "file_id", "blob").orderBy("doc_id")
  }

  def jsonlRoundtripPlain(spark: SparkSession, sfDir: String): DataFrame =
    jsonlRoundtrip(spark, sfDir, codec = "none")

  /** Same through the vendor `.jsonl.gz` layout — shares the plain
    * variant's oracle SQL (the decontam/bloom pattern). */
  def jsonlRoundtripGz(spark: SparkSession, sfDir: String): DataFrame =
    jsonlRoundtrip(spark, sfDir, codec = "gzip")

  /** The vendor-drop scenario: `.jsonl.gz` shards arrive with NO schema
    * contract — the schema is INFERRED from a bounded head probe of
    * every shard ([[graft.ext.Jsonl.inferSchema]]), then the full parse
    * runs FAILFAST against the inferred struct. The explicit
    * [[graft.ext.Jsonl.Schema]] is never consulted; the select-by-name
    * below fails loudly if inference lost a field, and the shared
    * original-table oracle proves inferred types landed exactly
    * (integers as BIGINT, strings as VARCHAR) — the
    * `llm_tfrecord_inferred_roundtrip` pattern transplanted. */
  def jsonlRoundtripInferred(spark: SparkSession, sfDir: String): DataFrame = {
    val files = graft.ext.Jsonl.synthesize(spark, docs(spark, sfDir),
      "doc_id", WarcDocsPerFile, codec = "gzip")
    graft.ext.Jsonl.docsInferred(spark, files, "file_id", "blob")
      .select(col("id").as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Same through the `.jsonl.zst` layout Dolma/RedPajama actually ship
    * (zstd-jni comes with Spark, offline-safe) — shares the plain
    * variant's oracle SQL. */
  def jsonlRoundtripZst(spark: SparkSession, sfDir: String): DataFrame =
    jsonlRoundtrip(spark, sfDir, codec = "zstd")

  /** Docs per synthesized WET file: 50 consecutive ids per file — 10
    * files at the 500-doc fixture, enough that record-boundary scanning
    * and multi-file parallelism are both exercised. */
  val WarcDocsPerFile = 50

  private def wetRoundtrip(spark: SparkSession, sfDir: String,
                           gzipped: Boolean): DataFrame = {
    val files = Warc.synthesizeWet(spark, docs(spark, sfDir), "doc_id",
      "text", WarcDocsPerFile, gzipped = gzipped)
    Warc.wetDocs(spark, files, "file_id", "blob").orderBy("doc_id")
  }

  /** WET container round-trip: corpus → real WARC/1.0 conversion
    * records → parse → corpus. The oracle reads the original table, so
    * a green hash proves the container framing byte-exactly (see
    * [[Warc]]). */
  def warcWetRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    wetRoundtrip(spark, sfDir, gzipped = false)

  /** Same through the Common Crawl `.wet.gz` layout — one gzip MEMBER
    * per record, inflated in one multi-member streaming pass. Shares
    * `llm_decontam`'s gating pattern: an exact-equivalent plan variant
    * gates on the same oracle SQL. */
  def warcGzRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    wetRoundtrip(spark, sfDir, gzipped = true)

  /** Raw-crawl ingest: corpus → fixture HTML pages → WARC `response`
    * records in the Common Crawl `.warc.gz` layout (one gzip member per
    * record) → parse → HTTP-head split → [[graft.ext.HtmlExtract]] →
    * text. The fixture plants noise on every extraction rule
    * (script/style/title drops, comments, attribute `>`, inline tags,
    * padding whitespace, the entity exemplar line), and the oracle
    * reconstructs the expected text from the ORIGINAL table plus the
    * planted constants — a green hash proves the whole chain:
    * container framing, gzip members, HTTP split, and all five
    * extraction rule families. */
  def warcHtmlExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val files = Warc.synthesizeWarc(spark, docs(spark, sfDir), "doc_id",
      "text", WarcDocsPerFile, gzipped = true)
    Warc.htmlDocs(spark, files, "file_id", "blob").orderBy("doc_id")
  }

  /** The same raw-crawl chain with each page's HTTP body WIRE-encoded
    * per doc_id % 5: identity, `Content-Encoding: gzip`, zlib
    * `deflate`, `Transfer-Encoding: chunked` (with chunk extension +
    * trailer noise), and gzip-then-chunked — the layerings real
    * captures store, since Common Crawl keeps bodies as received. The
    * oracle is `warc_html_extract`'s reconstruction; a green hash
    * proves de-chunk + inflate restore the byte stream exactly before
    * charset resolution and extraction. */
  def warcHtmlExtractEncoded(spark: SparkSession, sfDir: String): DataFrame = {
    val files = Warc.synthesizeWarcEncoded(spark, docs(spark, sfDir), "doc_id",
      "text", WarcDocsPerFile, gzipped = true)
    Warc.htmlDocs(spark, files, "file_id", "blob").orderBy("doc_id")
  }

  /** The same raw-crawl chain with each page's HTTP body planted under
    * one of 7 encodings (doc_id % 7): UTF-8 via Content-Type, UTF-16LE
    * BOM overriding a WRONG Content-Type, UTF-16BE BOM undeclared,
    * `<meta charset>` latin-1, Content-Type GBK, http-equiv
    * windows-1252, and undeclared latin-1 (the strict-UTF-8-probe
    * fallback). Every page plants a per-charset non-ASCII exemplar
    * line; the oracle reconstructs it from [[graft.ext.Warc.CharsetExemplars]]
    * — a green hash proves the full resolution precedence of
    * [[graft.ext.CharsetDetect]] on real container framing. */
  def warcCharsetExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val files = Warc.synthesizeWarcCharset(spark, docs(spark, sfDir),
      "doc_id", "text", WarcDocsPerFile, gzipped = true)
    Warc.htmlDocs(spark, files, "file_id", "blob").orderBy("doc_id")
  }

  /** Per-file record audit over ALL records (warcinfo + conversion):
    * counts and block byte totals — the numbers a crawl-ingest job
    * reconciles against the manifest before trusting a segment. */
  def warcFilesMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val files = Warc.synthesizeWet(spark, docs(spark, sfDir), "doc_id",
      "text", WarcDocsPerFile)
    Warc.records(spark, files, "file_id", "blob")
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_records"),
        sum(when(col("warc_type") === "conversion", 1L).otherwise(0L))
          .as("n_conversion"),
        sum("content_length").as("block_bytes"))
      .orderBy("file_id")
  }

  /** Session-cached window-count index over the existing-corpus split
    * (doc_id % 10 != 0), bucketed layout so the gated query exercises
    * the partition-pruned probe. */
  private def spanIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"span|$sfDir") { dir =>
      graft.ext.IncrementalSpanDedup.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, w = SpanW, windowBuckets = 16)
    }

  /** Incremental span dedup: the arriving shard's duplicated spans
    * against `indexed ∪ shard` via the persisted window-count index —
    * live-oracled as the full recompute restricted to shard docs. */
  def spanDedupIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalSpanDedup.spans(spark,
        spanIncIndexDir(spark, sfDir),
        docs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "text")
      .orderBy("doc_id", "span_start")

  /** Session-cached LM-count index: built from the existing-corpus
    * split, then the shard appended as an epoch — so the gated query
    * exercises BOTH the build and the O(batch) append path, and the
    * summed model must equal a full-corpus retrain. */
  private def lmIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"lm|$sfDir") { dir =>
      graft.ext.IncrementalNgramLm.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 =!= 0), "text", dir)
      graft.ext.IncrementalNgramLm.appendToIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 === 0), "text", dir,
        epoch = "shard1")
    }

  /** Incremental LM scoring: the shard scored under the SUMMED
    * per-epoch model — live-oracled as llm_lm_score (full-corpus
    * retrain) restricted to shard docs, proving count-monoid
    * equivalence. */
  def lmIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalNgramLm.score(spark,
        lmIncIndexDir(spark, sfDir),
        docs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "text")
      .orderBy("doc_id")

  /** CCNet-style n-gram LM quality score, self-trained on the corpus:
    * per-doc integer-bit cross-entropy (see [[NgramLm]] for why the
    * per-trigram cost is quantized to whole bits — cross-engine
    * exactness). */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame =
    NgramLm.selfScore(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** CCNet's head/middle/tail selection over the LM scores: exact rank
    * tertiles under (bits_per_trigram ASC, doc_id) — lower bits = more
    * fluent = head. The rank is computed DISTRIBUTED (range slices +
    * offset prefix-sum, never a single-partition window over the data —
    * [[graft.ext.GlobalRank]]); the oracle's plain global row_number()
    * must hash-match it exactly. */
  def lmBuckets(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.GlobalRank.withRank(
        NgramLm.selfScore(docs(spark, sfDir), "doc_id", "text"),
        Seq(col("bits_per_trigram").asc, col("doc_id").asc),
        rankCol = "lm_rank", totalCol = "__n")
      .select(col("doc_id"), col("lm_rank"),
        when((col("lm_rank") + 1) * 3 <= col("__n"), "head")
          .when((col("lm_rank") + 1) * 3 <= col("__n") * 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")

  /** MinHash-LSH near-dup (approximate candidates, exact verification).
    * No SQL oracle — LSH recall is probabilistic; correctness is covered
    * by the scalatest comparing it against [[nearDupJaccard]]. */
  def minhashNearDup(spark: SparkSession, sfDir: String): DataFrame =
    // bands=16 × rows=4 (S-curve midpoint ≈0.5): the corpus's true
    // near-dups sit at j≈0.9+ (recall ≈1 there, asserted in DedupSpec)
    // while background pairs at j≈0.05 collide with p≈1e-4 — the loose
    // 32×2 banding admitted ~8% of ALL pairs as candidates and made
    // verification quadratic-ish at sf0.1.
    Dedup.minhashNearDups(docs(spark, sfDir), "doc_id", "text", n = 3,
        bands = 16, rows = 4, threshold = 0.12, maxDf = JaccardMaxDf)
      .orderBy("id_a", "id_b")

  /** SimHash fingerprints (rows-only check: xxhash64 seeds are
    * Spark-specific; semantics covered by scalatest). */
  def simhashFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhash(docs(spark, sfDir), "doc_id", "text").orderBy("doc_id")

  /** SimHash near-dup pairs within 3 bits, via pigeonhole blocking
    * (rows-only: fingerprints are hash-seed-specific; the blocking
    * recall property — every pair within the ball shares a block — is
    * asserted in the scalatest). */
  def simhashNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashNearDups(
        Dedup.simhash(docs(spark, sfDir), "doc_id", "text"),
        "doc_id", maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** Brute-force cosine top-5 for the first 20 vectors as the query set.
    * Exact baseline for ANN; double math matches DuckDB's
    * list_cosine_similarity bit-for-bit, rounded to 1e-6 defensively. */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    Similarity.bruteForceTopK(all, all.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long")) // bigint: DuckDB row_number dtype
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-k (the 100 TB path; recall vs the exact
    * baseline is asserted in tests, not oracled). */
  def cosineTopKLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    Similarity.lshTopK(all, all.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** The SCALE-preset LSH top-k (12 planes × 8 tables): the prune that
    * actually prunes — candidate fraction <0.05 on this corpus
    * (spec-measured) vs the recall preset's deliberate ~1.0. Lower
    * recall on isotropic noise by design; on clustered production
    * embeddings this is the 100 TB configuration. Rows-only. */
  def cosineTopKLshScale(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    Similarity.lshTopK(all, all.where(col("vec_id") < 20),
        "vec_id", "embedding", k = 5,
        nPlanes = Similarity.ScaleNPlanes, tables = Similarity.ScaleTables)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** Session-scoped shared IVF model: both registered IVF queries probe
    * the SAME trained quantizer (training is deterministic, so this is a
    * pure compute cache — same putIfAbsent race rule as the shared
    * normalize/pair caches; Model is a plain value, nothing persisted).
    * WEAKLY keyed by the session: the values here hold no session
    * reference (centroid arrays / a dir string), so a weak key lets
    * closed sessions be collected instead of being retained for the JVM
    * lifetime (the DataFrame-valued caches in [[CdcQueries]] can't
    * benefit from this — their values are themselves session-bound). */
  private val sharedIvfModel =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Ivf.Model]]()

  private def ivfModel(spark: SparkSession, sfDir: String): Ivf.Model = {
    val perSession = sharedIvfModel.synchronized {
      sharedIvfModel.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, Ivf.Model])
    }
    // thunk may run twice under a race; training is deterministic pure
    // compute, so last-write-wins is safe (same rule as the other caches)
    perSession.getOrElseUpdate(sfDir,
      Ivf.train(emb(spark, sfDir), "vec_id", "embedding", nCells = 16))
  }

  /** IVF-Flat approximate top-k (the data-adapted ANN scale path, vs the
    * data-independent LSH twin). nProbe=4 of 16 cells = a 4× nominal
    * prune. Rows-only: centroids are engine-trained; the recall-vs-exact
    * and prune properties live in IvfSpec on a clustered corpus, where
    * IVF's adaptivity actually shows (this isotropic test corpus is
    * LSH's worst case and IVF's too — by design). */
  def cosineTopKIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    Ivf.topK(all, all.where(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, ivfModel(spark, sfDir), nProbe = 4)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** IVF inverted-list occupancy — the index-balance observable you
    * check before trusting an IVF configuration at a new scale
    * (rows-only: cell ids are centroid-dependent). */
  def ivfCellStats(spark: SparkSession, sfDir: String): DataFrame =
    Ivf.cellStats(emb(spark, sfDir), "embedding", ivfModel(spark, sfDir))
      .orderBy("cell")

  /** Session-scoped written IVF index (one write per session+sf, like
    * the other materializing caches; the temp dir is recursively deleted
    * on JVM exit by [[CdcQueries.tempSinkDir]]'s shutdown hook —
    * `File.deleteOnExit` would silently skip a non-empty directory). */
  private val sharedIvfIndex =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()

  private def ivfIndexDir(spark: SparkSession, sfDir: String): String = {
    val perSession = sharedIvfIndex.synchronized {
      sharedIvfIndex.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, String])
    }
    perSession.getOrElseUpdate(sfDir, {
      val dir = CdcQueries.tempSinkDir("graft-ivf-index")
      Ivf.writeIndex(emb(spark, sfDir), "embedding",
        ivfModel(spark, sfDir), dir.toString)
      dir.toString
    })
  }

  /** The SERVING path: top-k against the written cell-partitioned
    * index — the probe reads only the probed partition directories
    * (partition pruning asserted in IvfSpec; equality with the
    * in-memory [[cosineTopKIvf]] asserted there too). Rows-only. */
  def cosineTopKIvfIndexed(spark: SparkSession, sfDir: String): DataFrame =
    Ivf.topKIndexed(spark, ivfIndexDir(spark, sfDir),
        emb(spark, sfDir).where(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nProbe = 4)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")

  /** Session-cached IVF-PQ index over the full embedding table
    * ([[graft.ext.Pq.writeIndex]]): 64-dim vectors → 8 subspaces × 256
    * RESIDUAL codes (the IVFADC form — codebooks quantize
    * `unit(v) − cellCentroid`) = 8 code BYTES per vector, 1 byte per
    * subspace — still 32× smaller than the float rows the ADC scan
    * would otherwise stream, with measurably higher recall than the
    * r11 raw-position/32-code configuration at the SAME code size. */
  private def pqIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"pq|$sfDir") { dir =>
      val all = emb(spark, sfDir)
      val ivfm = ivfModel(spark, sfDir)
      val pqm = Pq.train(all, "vec_id", "embedding", m = 8, ksub = 256,
        residualOf = Some(ivfm))
      Pq.writeIndex(all, "vec_id", "embedding", ivfm, pqm, dir,
        residual = true)
    }

  /** IVF-PQ top-k: probe 4 of 16 cells, ADC-rank their CODES (8 table
    * lookups per candidate, floats untouched), exact-rerank the top 50
    * from raw vectors — reported sims are exact cosines, PQ only picks
    * who reaches the rerank ([[graft.ext.Pq]]). Rows-only under the
    * driver gate (trained codebooks); recall pinned by
    * [[pqRecall]]. */
  def cosineTopKPq(spark: SparkSession, sfDir: String): DataFrame =
    Pq.topKIndexed(spark, pqIndexDir(spark, sfDir),
        emb(spark, sfDir).where(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nProbe = 4, rerank = 100)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")

  // --------------------------------------------------------------------
  // Driver-gated recall / parity rows for the probabilistic ANN family.
  //
  // The approximate queries themselves are rows-only under the driver
  // gate (DuckDB cannot run the seeded LSH planes / trained centroids /
  // xxhash64 minhash). Their outputs ARE deterministic — driver-side
  // seeded planes, deterministic training samples, fixed tie-breaks — so
  // these companion queries put the guarantee the scalatests assert
  // under the driver's hash gate too: each one joins the approximate
  // result against its exact, already-oracle-green baseline IN SPARK and
  // emits the overlap counts. The oracle recomputes the exact side live
  // and pins the deterministic approximate side per scale factor (the
  // honest limit of what DuckDB can restate; a changed seed, plane
  // family, or tie-break shows up as a hash mismatch).
  // --------------------------------------------------------------------

  /** Overlap of an approximate top-k result with the exact baseline on
    * (query_id, neighbor_id): total exact rows, how many the approximate
    * search recovered, and recall. The division is two exact BIGINTs in
    * IEEE double — bit-identical across engines, no rounding needed. */
  private def topKRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val a = approx.select(col("query_id").as("__aq"), col("neighbor_id").as("__an"))
    exact.select("query_id", "neighbor_id")
      .join(a, col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
        "left")
      .agg(
        countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"),
        count(col("__aq")).as("n_hit"))
      .select(col("n_queries"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact").cast("double")).as("recall"))
  }

  /** Recall@5 of the recall-preset LSH top-k ([[cosineTopKLsh]]) against
    * the exact baseline ([[cosineTopK]]). */
  def lshRecall(spark: SparkSession, sfDir: String): DataFrame =
    topKRecall(cosineTopK(spark, sfDir), cosineTopKLsh(spark, sfDir))

  /** Recall@5 of the SCALE-preset LSH top-k — low on this isotropic
    * corpus BY DESIGN (see [[cosineTopKLshScale]]); the pinned value is
    * the regression guard on the prune behavior itself. */
  def lshScaleRecall(spark: SparkSession, sfDir: String): DataFrame =
    topKRecall(cosineTopK(spark, sfDir), cosineTopKLshScale(spark, sfDir))

  /** Recall@5 of IVF-Flat (nProbe=4 of 16) against the exact baseline. */
  def ivfRecall(spark: SparkSession, sfDir: String): DataFrame =
    topKRecall(cosineTopK(spark, sfDir), cosineTopKIvf(spark, sfDir))

  /** Recall@5 of IVF-PQ (same probes as [[ivfRecall]], candidates
    * ADC-shortlisted from 8-byte codes before the exact rerank) against
    * the exact baseline — the price of the 32× code compression is
    * whatever this pin records vs the IVF-Flat pin. */
  def pqRecall(spark: SparkSession, sfDir: String): DataFrame =
    topKRecall(cosineTopK(spark, sfDir), cosineTopKPq(spark, sfDir))

  /** Serving-path parity: the written cell-partitioned IVF index must
    * return EXACTLY the in-memory probe's rows — same neighbor at the
    * same rank with the same rounded similarity. `n_mismatch = 0` is the
    * SQL-expressible core of the oracle (no per-sf pin needed); the row
    * counts are `5 × |queries|`, recomputed live by the oracle. */
  def ivfIndexedParity(spark: SparkSession, sfDir: String): DataFrame = {
    val mem = cosineTopKIvf(spark, sfDir)
      .select(col("query_id"), col("rank"), col("neighbor_id").as("__mn"),
        col("sim").as("__ms"))
    val idx = cosineTopKIvfIndexed(spark, sfDir)
      .select(col("query_id"), col("rank"), col("neighbor_id").as("__in"),
        col("sim").as("__is"))
    mem.join(idx, Seq("query_id", "rank"), "full_outer")
      .agg(
        count(col("__mn")).as("n_memory"),
        count(col("__in")).as("n_indexed"),
        count(when(col("__mn").isNull || col("__in").isNull ||
          col("__mn") =!= col("__in") || col("__ms") =!= col("__is"), 1))
          .as("n_mismatch"))
  }

  /** Session-scoped persisted check-harness inputs, one cache for every
    * recall/gate row's shared side ([[graft.util.DfCache]] holds the
    * race rule). The discipline, everywhere: persist the REGISTERED
    * query's own plan (a re-tune of the production query then flows
    * into its gate by construction — the winnowChecksum rule), keep the
    * production query itself UNCACHED so its bench row keeps timing the
    * real pipeline, and put any production query whose plan equals a
    * persisted one in Bench.alwaysFork (the cache manager substitutes
    * persisted plans into EQUAL plans, faking in-JVM times). Values are
    * a few hundred pair/summary rows, never corpus-sized. */
  private val sharedDFs = new graft.util.DfCache

  private def cachedDF(key: String, spark: SparkSession, sfDir: String)
                      (mk: => DataFrame): DataFrame =
    sharedDFs(key, spark, sfDir)(mk)

  /** Exact-Jaccard ground truth for [[minhashRecall]]: the
    * threshold-0.12 df-capped pair set — the plan [[nearDupJaccard]]
    * registers. */
  private def exactJaccardPairs(spark: SparkSession, sfDir: String): DataFrame =
    cachedDF("exact_jaccard", spark, sfDir)(nearDupJaccard(spark, sfDir))

  /** The found side of [[minhashRecall]]: `llm_neardup_minhash`
    * (uncached, alwaysFork) times the production pipeline; the recall
    * row only needs its OUTPUT, a few hundred pairs. */
  private def minhashPairsCached(spark: SparkSession, sfDir: String): DataFrame =
    cachedDF("minhash_found", spark, sfDir)(minhashNearDup(spark, sfDir))

  /** Recall of MinHash-LSH near-dup pairs against the exact Jaccard
    * pairs (the [[nearDupJaccard]] plan, oracle-green). Both sides are
    * persisted check-harness inputs ([[exactJaccardPairs]] /
    * [[minhashPairsCached]]) — their production pipelines are timed by
    * their own registered queries, so the recall row's reps measure the
    * recall JOIN, not a third recomputation of each pipeline. MinHash
    * verifies its candidates exactly, so its pairs are a SUBSET of the
    * exact ones: `n_spurious = 0` is SQL-expressible; the recovered
    * count is pinned. */
  def minhashRecall(spark: SparkSession, sfDir: String): DataFrame =
    pairRecall(exactJaccardPairs(spark, sfDir), minhashPairsCached(spark, sfDir))

  /** SimHash blocking parity: the pigeonhole-blocked near-dup pairs must
    * equal the brute-force Hamming-ball pairs EXACTLY (blocking is
    * lossless within the ball — every pair within `maxHamming` bits
    * shares at least one of the `maxHamming + 1` blocks, and candidates
    * verify exactly). The brute-force side is an all-pairs check harness
    * — quadratic BY DESIGN, the in-Spark oracle for the blocked path,
    * never a production shape (the blocked path is the 100 TB one). Both
    * symmetric-difference counts are 0, SQL-expressible with no pins. */
  def simhashParity(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = Dedup.simhash(docs(spark, sfDir), "doc_id", "text")
    val blocked = Dedup.simhashNearDups(fps, "doc_id", maxHamming = 3)
      .select(col("id_a").as("__ba"), col("id_b").as("__bb"))
    val a = fps.select(col("doc_id").as("id_a"), col("simhash").as("__sa"))
    val b = fps.select(col("doc_id").as("id_b"), col("simhash").as("__sb"))
    val brute = a.crossJoin(b)
      .where(col("id_a") < col("id_b") &&
        bit_count(col("__sa").bitwiseXOR(col("__sb"))) <= 3)
      .select("id_a", "id_b")
    brute.join(blocked,
        col("id_a") === col("__ba") && col("id_b") === col("__bb"), "full_outer")
      .agg(
        count(when(col("id_a").isNotNull, 1)).as("n_brute"),
        count(when(col("__ba").isNotNull, 1)).as("n_blocked"),
        count(when(col("id_a").isNull || col("__ba").isNull, 1)).as("n_mismatch"))
  }

  /** LSH prune observability under the driver gate: the candidate
    * fraction of the recall preset (4 planes × 32 tables) for the
    * registered query set. Deterministic given the seeded plane family;
    * `n_possible` is recomputed live by the oracle, `n_candidates` is
    * pinned per scale factor. A drifting value means the plane family,
    * bucketing kernel, or dedup discipline changed. */
  def lshCandidateStats(spark: SparkSession, sfDir: String): DataFrame = {
    val all = emb(spark, sfDir)
    Similarity.candidateFraction(all, all.where(col("vec_id") < 20),
      "vec_id", "embedding", nPlanes = 4, tables = 32)
  }

  /** Mirror of [[CdcQueries.dropSharedCaches]] for this object's
    * DataFrame-valued caches (the IVF model/index caches hold plain
    * values and on-disk paths — clearCache doesn't invalidate them). */
  private[graft] def dropSharedCaches(): Unit =
    sharedDFs.clear()

  /** Shared exact-cosine ground truth: BOTH near-dup recall rows
    * compare against the same all-pairs set (2000 vectors at sf0.1 →
    * 2M scored pairs); the value IS [[Similarity.exactCosinePairs]]'
    * output, which shares the verify expression with the LSH path.
    * TIMING SEMANTICS, deliberate: recall reps time the verify-join
    * over a materialized ground truth, not the harness's all-pairs
    * compute — the harness is a CHECK, not an engine observable. */
  private def exactCosinePairs(spark: SparkSession, sfDir: String,
                               threshold: Double): DataFrame =
    cachedDF(s"exact_cosine_$threshold", spark, sfDir)(
      Similarity.exactCosinePairs(emb(spark, sfDir), "vec_id",
        "embedding", threshold))

  /** Overlap of a found pair set with the exact one on (id_a, id_b):
    * shared shape of the pair-recall rows ([[minhashRecall]] and the
    * cosine near-dup recalls). */
  private def pairRecall(exact: DataFrame, found: DataFrame): DataFrame =
    exact.select("id_a", "id_b")
      .join(found.select(col("id_a").as("__fa"), col("id_b").as("__fb")),
        col("id_a") === col("__fa") && col("id_b") === col("__fb"), "full_outer")
      .agg(
        count(when(col("id_a").isNotNull, 1)).as("n_exact"),
        count(when(col("id_a").isNotNull && col("__fa").isNotNull, 1)).as("n_found"),
        count(when(col("id_a").isNull, 1)).as("n_spurious"))
      .select(col("n_exact"), col("n_found"), col("n_spurious"),
        (col("n_found").cast("double") / col("n_exact").cast("double")).as("recall"))

  /** Recall of the LSH-bucketed near-dup pairs ([[cosineNearDup]], the
    * 100 TB production shape) against the all-pairs exact ground truth —
    * the exact side is fully SQL-expressible, so the oracle recomputes
    * it live; only the deterministic found-count is pinned. The found
    * side is the registered query's own plan, persisted via [[cachedDF]]
    * (`llm_cosine_neardup` sits in `alwaysFork`), so recall reps time
    * the recall JOIN, not a recompute of the found pipeline. */
  def cosineNearDupRecall(spark: SparkSession, sfDir: String): DataFrame =
    pairRecall(exactCosinePairs(spark, sfDir, 0.35),
      cachedDF("neardup_found", spark, sfDir)(cosineNearDup(spark, sfDir)))

  /** Recall of the SCALE-preset near-dup pairs (12×8, the prune that
    * prunes) against the same exact ground truth: LOW on this isotropic
    * corpus by design — the pinned value is the regression guard on the
    * prune itself (see [[cosineNearDupScale]]). */
  def cosineNearDupScaleRecall(spark: SparkSession, sfDir: String): DataFrame =
    pairRecall(exactCosinePairs(spark, sfDir, 0.35),
      cachedDF("neardup_scale_found", spark, sfDir)(
        cosineNearDupScale(spark, sfDir)).where(col("is_neardup")))

  /** SemDeDup verdicts (Abbas et al. 2023): per-vector kept/pruned under
    * the session IVF quantizer at tau=0.35 (the corpus's exact-pair
    * ground-truth threshold). Rows-only — cluster assignment is the
    * Spark-seeded k-means; the hash gate is [[semDedupCheck]]. */
  def semDedup(spark: SparkSession, sfDir: String): DataFrame =
    SemDedup.prune(emb(spark, sfDir), "vec_id", "embedding",
        ivfModel(spark, sfDir), tau = 0.35)
      .orderBy("vec_id")

  /** The SemDeDup gate: pruned vectors are a STRUCTURAL subset of
    * vectors with a smaller-id exact-cosine neighbor at tau anywhere
    * (both sides score with [[Similarity.pairSim]]) — so
    * n_spurious_pruned is live-computed and must be ZERO; n_catchable
    * is recomputed live by the oracle; the deterministic pruned count
    * is pinned per scale factor. coverage < 1 is the method's disclosed
    * price: only within-cluster pairs are candidates. */
  def semDedupCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val verdicts = cachedDF("semdedup", spark, sfDir)(semDedup(spark, sfDir))
    val pruned = verdicts.where(!col("kept")).select("vec_id")
    val catchable = exactCosinePairs(spark, sfDir, 0.35)
      .select(col("id_b").as("vec_id")).distinct()
    val joined = pruned
      .join(catchable.withColumn("__c", lit(true)), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_pruned"),
        count(when(col("__c").isNull, 1)).as("n_spurious_pruned"))
    emb(spark, sfDir).agg(count(lit(1)).as("n_vectors"))
      .crossJoin(catchable.agg(count(lit(1)).as("n_catchable")))
      .crossJoin(joined) // all single-row aggregates
      .select(col("n_vectors"), col("n_catchable"), col("n_pruned"),
        col("n_spurious_pruned"),
        (col("n_pruned").cast("double") / col("n_catchable").cast("double"))
          .as("coverage"))
  }

  /** Session-cached clustered index over the existing-embedding split —
    * the [[graft.ext.Ivf]] artifact (model + cell-partitioned data),
    * shared shape with ANN serving. */
  private def semIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"semdedup|$sfDir") { dir =>
      graft.ext.IncrementalSemDedup.writeIndex(
        emb(spark, sfDir).where(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", dir, nCells = 16)
    }

  /** Incremental SemDeDup: the arriving shard's verdicts against the
    * persisted clustered index (witnesses = indexed ∪ earlier-in-batch
    * vectors, the one-shot rule). Rows-only — cell assignment is the
    * index's Spark-seeded quantizer; gated by
    * [[semDedupIncrementalCheck]]. */
  def semDedupIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalSemDedup.prune(spark,
        semIncIndexDir(spark, sfDir),
        emb(spark, sfDir).where(col("vec_id") % 10 === 0),
        "vec_id", "embedding", tau = 0.35)
      .orderBy("vec_id")

  /** The incremental gate: same structural-subset property as
    * [[semDedupCheck]], restricted to the shard — every pruned shard
    * vector has a smaller-id exact neighbor at tau ANYWHERE (the
    * witness was real whichever side of the index it sat on); the
    * catchable superset is live in the oracle, the deterministic pruned
    * count pinned per scale factor. */
  def semDedupIncrementalCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val verdicts = cachedDF("semdedup_inc", spark, sfDir)(
      semDedupIncremental(spark, sfDir))
    val pruned = verdicts.where(!col("kept")).select("vec_id")
    val catchable = exactCosinePairs(spark, sfDir, 0.35)
      .where(col("id_b") % 10 === 0)
      .select(col("id_b").as("vec_id")).distinct()
    val joined = pruned
      .join(catchable.withColumn("__c", lit(true)), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_pruned"),
        count(when(col("__c").isNull, 1)).as("n_spurious_pruned"))
    emb(spark, sfDir).where(col("vec_id") % 10 === 0)
      .agg(count(lit(1)).as("n_shard"))
      .crossJoin(catchable.agg(count(lit(1)).as("n_catchable")))
      .crossJoin(joined) // all single-row aggregates
      .select(col("n_shard"), col("n_catchable"), col("n_pruned"),
        col("n_spurious_pruned"),
        (col("n_pruned").cast("double") / col("n_catchable").cast("double"))
          .as("coverage"))
  }

  /** IVF occupancy checksum under the driver gate: every corpus vector
    * is assigned to exactly one cell (`n_assigned` equals the corpus
    * count — live in the oracle), the used-cell count and the largest
    * inverted list are deterministic given the trained centroids
    * (pinned). The full per-cell histogram stays rows-only in
    * [[ivfCellStats]]; this row makes its invariants hash-visible. */
  def ivfCellsChecksum(spark: SparkSession, sfDir: String): DataFrame =
    Ivf.cellStats(emb(spark, sfDir), "embedding", ivfModel(spark, sfDir))
      .agg(
        count(lit(1)).as("n_cells_used"),
        sum("n_vectors").as("n_assigned"),
        max("n_vectors").as("largest_cell"))

  /** Embedding hygiene stats (the pass a pipeline runs before indexing:
    * norm distribution, zero vectors, value range). Scalar outputs via
    * the codegen dot kernel; rounded like the similarity surface. */
  def embedStats(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir).select(
      col("vec_id"),
      round(Similarity.l2(col("embedding")), 6).as("l2_norm"),
      round(Similarity.dot(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")), 6).as("sq_norm"),
      size(col("embedding")).cast("long").as("dim"))
    .orderBy("vec_id")

  /** int8 quantization audit over the embeddings: per-vector scale,
    * exact code checksum, worst reconstruction error (see
    * [[graft.ext.Quantize]]). */
  def quantizeStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Quantize.stats(emb(spark, sfDir), "vec_id", "embedding")
      .orderBy("vec_id")

  /** Per-language corpus stats: integer-exact totals. */
  def textStatsPerLang(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.perLangStats(docs(spark, sfDir))

  /** Per-document quality metrics (word/token counts, ratios). */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      TextStats.nWords(col("text")).cast("long").as("n_words"),
      TextStats.nTokens(col("text")).cast("long").as("n_tokens"),
      TextStats.stopwordRatio(col("text")).as("stopword_ratio"),
      TextStats.meanWordLen(col("text")).as("mean_word_len"))
    .orderBy("doc_id")

  /** Per-document punctuation ratio + composite quality score. */
  def textQualityScore(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      TextStats.punctRatio(col("text")).as("punct_ratio"),
      TextStats.qualityScore(col("text")).as("quality_score"))
    .orderBy("doc_id")

  /** Language-ID heuristic: predicted language per doc, aggregated. */
  def langIdCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(TextStats.langId(col("text")).as("lang_pred"))
      .groupBy("lang_pred").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_pred")

  /** Char-trigram-profile language ID (the n-gram variant), aggregated. */
  def langIdNgramCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(TextStats.langIdNgram(col("text")).as("lang_pred"))
      .groupBy("lang_pred").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_pred")

  /** Reproducible 20% corpus sample via key-hash selection, reported as
    * per-language doc counts + id checksums (see [[Sampling]] — the
    * point is that retries/repartitions/other engines select the exact
    * same documents, which the DuckDB oracle proves). */
  def sampleStrata(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.deterministicSample(docs(spark, sfDir), "doc_id",
        perMillion = 200000)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_checksum"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")

  /** Per-language EXACT document-length quantiles (the length-filter
    * calibration numbers a corpus pipeline reads before thresholding).
    * Spark's `percentile` aggregate accumulates a value→count map with
    * map-side partial merge — exact and scalable for bounded integer
    * domains like lengths (an approx sketch would not hash-match the
    * oracle); both engines use type-7 linear interpolation, so the
    * doubles agree bit-for-bit on integer inputs. */
  def docsLengthQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).groupBy("lang").agg(
      expr("percentile(n_chars, 0.5)").as("p50"),
      expr("percentile(n_chars, 0.9)").as("p90"),
      expr("percentile(n_chars, 0.99)").as("p99"),
      count(lit(1)).as("n_docs"))
    .orderBy("lang")

  /** The 100 TB twin of [[docsLengthQuantiles]]: `approx_percentile`
    * (KLL-sketch family, mergeable, bounded memory per group) with a
    * rank-error accuracy knob of 1e4 → observed rank within ±0.01% of
    * the requested quantile. WHEN TO USE WHICH: the exact `percentile`
    * map is right for bounded integer domains (doc lengths, token
    * counts — the map size is the number of DISTINCT values, not rows);
    * on continuous or unbounded domains (scores, latencies, floats) the
    * value→count map grows with cardinality and the sketch is the only
    * shape that survives scale. Rows-only under the driver gate: the
    * sketch's picked elements are implementation-specific, so DuckDB's
    * `approx_quantile` (t-digest) agrees only to within error bounds —
    * the exact twin stays the hash gate; the error bound vs the exact
    * quantiles is asserted in the scalatest. */
  def docsLengthQuantilesApprox(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).groupBy("lang").agg(
      expr("approx_percentile(n_chars, 0.5, 10000)").cast("double").as("p50"),
      expr("approx_percentile(n_chars, 0.9, 10000)").cast("double").as("p90"),
      expr("approx_percentile(n_chars, 0.99, 10000)").cast("double").as("p99"),
      count(lit(1)).as("n_docs"))
    .orderBy("lang")

  /** Per-document repetition quality signals (Gopher-style duplicate-
    * word / top-bigram fractions; see [[TextStats.repetitionStats]]). */
  def textRepetitionStats(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.repetitionStats(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** The composed quality-filter pass (the C4-shaped keep/drop decision
    * a corpus pipeline actually runs): per-document verdict + the FIRST
    * failing rule as the reason, built entirely from the already-gated
    * quality signals ([[TextStats.nWords]], `n_chars`,
    * [[TextStats.stopwordRatio]]) so the whole decision table is
    * hash-checkable in DuckDB. Rule order is part of the contract —
    * reasons are deterministic because each doc reports the first rule
    * it fails, not an arbitrary member of the failing set. Thresholds
    * are corpus-calibrated to exercise every branch at the gated scale
    * factors. Map-side only: no shuffle, no UDFs. */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
        col("doc_id"),
        TextStats.nWords(col("text")).cast("long").as("n_words"),
        col("n_chars"),
        TextStats.stopwordRatio(col("text")).as("stopword_ratio"))
      .withColumn("reason",
        when(col("n_words") < 20, "too_short")
          .when(col("n_chars") > 450, "too_long")
          .when(col("stopword_ratio") < 0.02, "low_stopword")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
      .orderBy("doc_id")

  /** Compression-ratio quality signal (see [[graft.ext.CompressStats]]):
    * per-doc DEFLATE length + ratio over the UTF-8 bytes. zlib is not
    * SQL-restatable, so this row is rows-only, gated by
    * [[textCompressChecksum]] (SparkEntry.gates). */
  def textCompressStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.CompressStats
      .deflateStats(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** The compression gate: n_docs and sum_raw are LIVE in the oracle
    * (UTF-8 byte length is `octet_length(encode(text))` in DuckDB);
    * the deflate aggregates are pinned per sf (the xxhash64/minhash
    * discipline — zlib exists in neither SQL engine). */
  def textCompressChecksum(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.CompressStats
      .deflateStats(docs(spark, sfDir), "doc_id", "text")
      .agg(count(lit(1)).as("n_docs"),
        sum("raw_len").as("sum_raw"),
        sum("deflate_len").as("sum_deflate"),
        min("deflate_len").as("min_deflate"),
        max("deflate_len").as("max_deflate"))

  /** ORC round-trip: corpus → Spark's built-in ORC writer → vectorized
    * read back → hash-gate against the ORIGINAL parquet table (the
    * jsonl/WET oracle pattern). Proves type-exact round-tripping
    * through the other columnar production format. */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-orc").toString
    docs(spark, sfDir).write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** CSV round-trip with an explicit read schema and quote/escape
    * discipline (`escape='"'` = RFC 4180 doubled quotes, multiLine on
    * the read side so quoted newlines can never shear a row). The
    * row-interchange format metadata actually ships in. */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-csv").toString
    val d = docs(spark, sfDir)
    d.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(dir)
    spark.read.schema(d.schema).option("header", "true")
      .option("escape", "\"").option("multiLine", "true").csv(dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** The boolean training label for the Naive-Bayes quality classifier:
    * the [[qualityFilter]] keep-predicate. This is the FineWeb/DCLM
    * bootstrap — distill a cheap heuristic gate into a token-level
    * model that then generalizes beyond the gate's three rules. Kept
    * identical to the `llm_quality_filter` row's (oracle-green) logic
    * so the oracle can restate the labels verbatim. */
  private def nbLabel: org.apache.spark.sql.Column =
    (TextStats.nWords(col("text")) >= 20) &&
      (col("n_chars") <= 450) &&
      (TextStats.stopwordRatio(col("text")) >= 0.02)

  private def nbLabeled(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).withColumn("__graft_quality", nbLabel)

  /** Model-based quality scoring (see [[graft.ext.NaiveBayes]]):
    * self-trained on the corpus with heuristic-gate labels, every doc
    * scored under the learned token model. Integer-bit arithmetic —
    * fully live oracle. */
  def nbScore(spark: SparkSession, sfDir: String): DataFrame = {
    val d = nbLabeled(spark, sfDir)
    graft.ext.NaiveBayes.score(d, "doc_id", "text",
        graft.ext.NaiveBayes.train(d, "text", "__graft_quality"))
      .orderBy("doc_id")
  }

  /** Confusion matrix of the classifier's self-predictions against the
    * heuristic labels — the training-signal sanity check a production
    * pipeline runs before trusting the model's off-gate generalization
    * (up to 4 integer-count rows; on this corpus the matrix is exactly
    * diagonal — the token model fully separates the gate's classes —
    * so disagreement rows would flag training drift). */
  def nbConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val d = nbLabeled(spark, sfDir)
    graft.ext.NaiveBayes.score(d, "doc_id", "text",
        graft.ext.NaiveBayes.train(d, "text", "__graft_quality"))
      .join(d.select(col("doc_id"), col("__graft_quality").as("label")),
        Seq("doc_id"))
      .groupBy("label", "predicted").agg(count(lit(1)).as("n_docs"))
      .orderBy("label", "predicted")
  }

  private def nbIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"nb|$sfDir") { dir =>
      graft.ext.IncrementalNaiveBayes.writeIndex(
        nbLabeled(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "text", "__graft_quality", dir)
      graft.ext.IncrementalNaiveBayes.appendToIndex(
        nbLabeled(spark, sfDir).where(col("doc_id") % 10 === 0),
        "text", "__graft_quality", dir, epoch = "shard1")
    }

  /** Incremental classifier scoring: the shard scored under the SUMMED
    * per-epoch model — live-oracled as the full-corpus retrain
    * restricted to shard docs, proving count-monoid equivalence (see
    * [[graft.ext.IncrementalNaiveBayes]]). */
  def nbIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalNaiveBayes.score(spark,
        nbIncIndexDir(spark, sfDir),
        docs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "text")
      .orderBy("doc_id")

  /** Benchmark-overlap decontamination (see
    * [[graft.ext.Decontamination]]): every 17th doc_id plays the
    * held-out benchmark suite, the rest the training corpus; 8-word
    * grams (lowercased, Jaccard-family tokenization) are long enough
    * that only genuinely copied spans collide. Fully SQL-expressible —
    * live oracle, no pins. */
  def decontam(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    graft.ext.Decontamination.decontaminate(
        corpus = d.where(col("doc_id") % 17 =!= 0),
        bench = d.where(col("doc_id") % 17 === 0),
        idCol = "doc_id", textCol = "text", n = 8)
      .orderBy("doc_id")
  }

  /** Session-scoped persisted incremental indexes (the [[ivfIndexDir]]
    * pattern): the shingle/df index over the "existing corpus" split and
    * the benchmark gram set, each written once per (session, sfDir) into
    * a shutdown-cleaned temp dir. */
  private val sharedIncIndex =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()

  private def incIndexDir(spark: SparkSession, key: String)
                         (build: String => Unit): String = {
    val perSession = sharedIncIndex.synchronized {
      sharedIncIndex.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, String])
    }
    perSession.getOrElseUpdate(key, {
      val dir = CdcQueries.tempSinkDir("graft-inc-index").toString
      build(dir)
      dir
    })
  }

  /** The incremental-dedup corpus split: doc_id % 10 == 0 plays the
    * arriving daily shard; the rest are the indexed existing corpus.
    * Disjoint by construction (the [[graft.ext.IncrementalDedup]]
    * contract). */
  private def jaccardIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"jaccard|$sfDir") { dir =>
      // bucketed layout (the 100 TB storage shape): the oracle-gated
      // query therefore proves the partition-pruned probe path
      graft.ext.IncrementalDedup.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, n = 3, maxDf = JaccardMaxDf,
        shingleBuckets = 16)
    }

  private def decontamIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"decontam|$sfDir") { dir =>
      graft.ext.Decontamination.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 17 === 0),
        "doc_id", "text", dir, n = 8)
    }

  /** Incremental append-batch near-dup against the persisted shingle
    * index: which shard docs duplicate the existing corpus (or each
    * other), WITHOUT the full-corpus self-join. Provably equal to
    * [[nearDupJaccard]]'s full recompute over all docs restricted to
    * pairs touching the shard — including the combined-df cap — which
    * is exactly what the live oracle recomputes. */
  def dedupIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalDedup.nearDupPairs(spark,
        jaccardIndexDir(spark, sfDir),
        docs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "text", threshold = 0.12)
      .orderBy("id_a", "id_b")

  /** Session-cached banded-signature index over the existing-corpus
    * split — [[jaccardIndexDir]]'s approximate twin
    * ([[graft.ext.IncrementalMinHash]]): 16 bands × 4 rows, the
    * registered MinHash preset. */
  private def minhashIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"minhash|$sfDir") { dir =>
      // partitioned layout (the 100 TB probe shape): the gated query
      // exercises the partition-pruned scan path
      graft.ext.IncrementalMinHash.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, n = 3, bands = 16, rows = 4,
        bucketPartitions = 16)
    }

  /** Incremental MinHash near-dup: the arriving shard probed against
    * the PERSISTED signature index (bands rows per indexed doc — no
    * gram-level tables), candidates verified by exact UNCAPPED Jaccard
    * over the candidate docs' text. A structural subset of the uncapped
    * exact pair set restricted to shard-touching pairs; recall pinned
    * by [[minhashIncrementalRecall]]. Rows-only under the driver
    * gate (the banded xxhash64 family is Spark-specific). */
  def minhashIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalMinHash.nearDupPairs(spark,
        minhashIncIndexDir(spark, sfDir),
        docs(spark, sfDir).where(col("doc_id") % 10 === 0),
        docs(spark, sfDir),
        "doc_id", "text", threshold = 0.12)
      .orderBy("id_a", "id_b")

  /** Gate row for [[minhashIncremental]]: overlap with the exact
    * UNCAPPED Jaccard pair set restricted to shard-touching pairs (the
    * twin drops the df cap by design — see
    * [[graft.ext.IncrementalMinHash]]'s scaladoc; on this corpus the
    * cap binds nothing, so the denominator equals
    * `llm_dedup_incremental`'s). Exact side recomputed live by the
    * oracle; the deterministic found count is pinned; n_spurious = 0 is
    * structural (the found side shares [[Dedup.shingles]] and the exact
    * jaccard expression). */
  def minhashIncrementalRecall(spark: SparkSession, sfDir: String): DataFrame =
    pairRecall(
      cachedDF("exact_jaccard_uncapped_restricted", spark, sfDir)(
        Dedup.jaccardPairs(docs(spark, sfDir), "doc_id", "text", n = 3,
            threshold = 0.12, maxDf = Long.MaxValue)
          .where(col("id_a") % 10 === 0 || col("id_b") % 10 === 0)),
      cachedDF("minhash_inc_found", spark, sfDir)(
        minhashIncremental(spark, sfDir)))

  /** Session-cached SimHash block index over the existing-corpus split
    * — the third incremental member ([[graft.ext.IncrementalSimHash]]):
    * maxHamming+1 fixed-width rows per doc, partitioned layout. */
  private def simhashIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"simhash|$sfDir") { dir =>
      graft.ext.IncrementalSimHash.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, maxHamming = 3, blockPartitions = 16)
    }

  /** Incremental SimHash near-dup: the arriving shard probed against
    * the PERSISTED pigeonhole-block index — EXACT within the Hamming
    * ball (blocking is lossless; hamming comes from the stored
    * fingerprints), equal to the blocked full recompute restricted to
    * shard-touching pairs. Rows-only under the driver gate (xxhash64
    * fingerprints are Spark-specific); gated by
    * [[simhashIncrementalParity]]. */
  def simhashIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalSimHash.nearDupPairs(spark,
        simhashIncIndexDir(spark, sfDir),
        docsShard(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "text")
      .orderBy("id_a", "id_b")

  /** Gate row for [[simhashIncremental]]: the incremental blocked path
    * must EQUAL the brute-force Hamming-ball pairs over the whole
    * corpus restricted to shard-touching pairs — zero mismatches, not
    * a recall bound (the [[simhashParity]] contract, incremental
    * form). The brute side is the quadratic in-Spark check harness;
    * the count is pinned per sf in the oracle. */
  def simhashIncrementalParity(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = Dedup.simhash(docs(spark, sfDir), "doc_id", "text")
    val a = fps.select(col("doc_id").as("id_a"), col("simhash").as("__sa"))
    val b = fps.select(col("doc_id").as("id_b"), col("simhash").as("__sb"))
    val brute = a.crossJoin(b)
      .where(col("id_a") < col("id_b") &&
        bit_count(col("__sa").bitwiseXOR(col("__sb"))) <= 3 &&
        (col("id_a") % 10 === 0 || col("id_b") % 10 === 0))
      .select("id_a", "id_b")
    val inc = cachedDF("simhash_inc_found", spark, sfDir)(
        simhashIncremental(spark, sfDir))
      .select(col("id_a").as("__ba"), col("id_b").as("__bb"))
    brute.join(inc,
        col("id_a") === col("__ba") && col("id_b") === col("__bb"), "full_outer")
      .agg(
        count(when(col("id_a").isNotNull, 1)).as("n_brute"),
        count(when(col("__ba").isNotNull, 1)).as("n_blocked"),
        count(when(col("id_a").isNull || col("__ba").isNull, 1)).as("n_mismatch"))
  }

  /** Incremental decontamination: the arriving shard (corpus docs with
    * doc_id % 10 == 0) flagged against the PERSISTED benchmark gram set
    * — [[decontam]]'s report restricted to the shard, with the bench
    * side read instead of recomputed. Live oracle. */
  def decontamIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Decontamination.flagAgainstIndex(spark,
        decontamIndexDir(spark, sfDir),
        docs(spark, sfDir)
          .where(col("doc_id") % 17 =!= 0 && col("doc_id") % 10 === 0),
        "doc_id", "text")
      .orderBy("doc_id")

  /** Session-cached Bloom-augmented benchmark gram index
    * ([[graft.ext.Decontamination.writeBloomIndex]]): the exact gram
    * parquet plus a ~1.2 byte/gram sketch, built once per
    * (session, sfDir). */
  private def decontamBloomIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"decontam-bloom|$sfDir") { dir =>
      graft.ext.Decontamination.writeBloomIndex(
        docs(spark, sfDir).where(col("doc_id") % 17 === 0),
        "doc_id", "text", dir, n = 8, fpp = 0.01)
    }

  /** Bloom-prefiltered decontamination over the FULL corpus split: the
    * map-side sketch probe drops non-overlapping grams before any
    * shuffle, the exact verify join kills the sketch's false positives,
    * and the report equals [[decontam]] exactly — same oracle SQL, so
    * the green hash IS the proof that fpp never leaks into the answer
    * (see [[graft.functions.BloomMightContain]] for the 100 TB case). */
  def decontamBloom(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Decontamination.flagWithBloom(spark,
        decontamBloomIndexDir(spark, sfDir),
        docs(spark, sfDir).where(col("doc_id") % 17 =!= 0),
        "doc_id", "text")
      .orderBy("doc_id")

  /** Session-cached IVF index over the EXISTING embedding split (the
    * incremental counterpart of [[ivfIndexDir]]): trained and written
    * once on vec_id % 10 != 0; arriving vectors probe it. */
  private def ivfIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"ivf-inc|$sfDir") { dir =>
      val old = emb(spark, sfDir).where(col("vec_id") % 10 =!= 0)
      val model = Ivf.train(old, "vec_id", "embedding", nCells = 16)
      Ivf.writeIndex(old, "embedding", model, dir)
    }

  /** Incremental embedding near-dup: the arriving vector shard
    * (vec_id % 10 == 0) probes the PERSISTED IVF index for new-vs-old
    * pairs at cosine >= 0.35 (top-20 per probe, cells pruned), plus the
    * exact pairs within the small shard itself — the embedding-space
    * member of the incremental triad (text [[dedupIncremental]],
    * decontam [[decontamIncremental]]). Rows-only under the driver
    * gate; [[cosineIncrementalRecall]] pins recall against the exact
    * restricted ground truth with a live denominator. */
  def cosineNearDupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val newVecs = emb(spark, sfDir).where(col("vec_id") % 10 === 0)
    val no = Ivf.topKIndexed(spark, ivfIncIndexDir(spark, sfDir), newVecs,
        "vec_id", "embedding", k = 20, nProbe = 4)
      .where(col("sim") >= 0.35)
      .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
        greatest(col("query_id"), col("neighbor_id")).as("id_b"),
        col("sim"))
    // within-shard pairs: the shard is batch-sized by contract, so the
    // exact harness shape is the production shape here
    val nn = Similarity.exactCosinePairs(newVecs, "vec_id", "embedding",
      threshold = 0.35)
    no.unionByName(nn).orderBy("id_a", "id_b")
  }

  /** Gate row for [[cosineNearDupIncremental]]: overlap with the exact
    * all-pairs ground truth restricted to shard-touching pairs. The
    * found side shares `Similarity.pairSim` with the exact side, so
    * `n_spurious = 0` is structural; the oracle recomputes `n_exact`
    * live and pins the deterministic found count per sf. */
  def cosineIncrementalRecall(spark: SparkSession, sfDir: String): DataFrame =
    pairRecall(
      exactCosinePairs(spark, sfDir, 0.35)
        .where(col("id_a") % 10 === 0 || col("id_b") % 10 === 0),
      cachedDF("cosine_inc_found", spark, sfDir)(
        cosineNearDupIncremental(spark, sfDir)))

  /** Data-mixture planning rollup: per (source, lang) document counts,
    * token/char totals, and each cell's share of the corpus token budget
    * — the table a training run's sampling weights are derived from.
    * One hash aggregation; the grand total joins back as a 1-row
    * broadcast (the [[vocabStats]] pattern), so the shape is two narrow
    * shuffles regardless of corpus size. */
  def mixtureStats(spark: SparkSession, sfDir: String): DataFrame = {
    val g = docs(spark, sfDir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.nTokens(col("text")).cast("long")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
    val tot = g.agg(sum(col("total_tokens")).as("__tot"))
    g.crossJoin(broadcast(tot))
      .withColumn("token_share",
        round(col("total_tokens").cast("double") / col("__tot").cast("double"), 6))
      .drop("__tot")
      .orderBy("source", "lang")
  }

  /** Temperature-mixing knobs for the registered rows: alpha=0.5 (the
    * common smoothing), budget 25k tokens — sized so the dominant
    * language ('en', ~12k tokens at sf0.01) genuinely down-samples
    * while every low-resource language clamps at keep-everything,
    * exercising both arms of the rate formula. */
  val MixtureAlpha = 0.5
  val MixtureBudgetTokens = 25000L

  private def langTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.nTokens(col("text")).cast("long")).as("total_tokens"))

  /** Per-language temperature keep-rates (see
    * [[Sampling.temperatureRates]]): the multilingual-rebalancing rate
    * table, integer-exact so the oracle reproduces it bit-for-bit. */
  def mixtureRates(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.temperatureRates(langTokens(spark, sfDir), "total_tokens",
        MixtureAlpha, MixtureBudgetTokens)
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("weight"), col("rate_ppm"))
      .orderBy("lang")

  /** The resampled mixture itself, summarized per language (kept doc /
    * token counts + id checksum — the sample is a deterministic
    * key-hash filter, so the checksum pins the exact kept SET). */
  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rates = Sampling.temperatureRates(langTokens(spark, sfDir),
      "total_tokens", MixtureAlpha, MixtureBudgetTokens)
    Sampling.temperatureSample(
        docs(spark, sfDir)
          .select(col("doc_id"), col("lang"),
            TextStats.nTokens(col("text")).cast("long").as("__toks")),
        "doc_id", "lang", rates)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("__toks")).as("tokens_kept"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy("lang")
  }

  /** k-means knobs for the registered rows: 8 cells, 3 Lloyd rounds —
    * enough rounds that assignments move off the id-ordered seeds (the
    * oracle replays every round bit-for-bit, so more adds only bench
    * time). */
  val KMeansK = 8
  val KMeansIters = 3

  private def kmeansAssignments(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.KMeans.train(emb(spark, sfDir), "vec_id", "embedding",
      k = KMeansK, iters = KMeansIters)._2

  /** Distributed fixed-point Lloyd k-means — final (vec_id, cell)
    * assignment after [[KMeansIters]] full-corpus rounds (see
    * [[graft.ext.KMeans]]; integer arithmetic end-to-end, so the
    * DuckDB oracle reproduces every round). */
  def kmeansAssign(spark: SparkSession, sfDir: String): DataFrame =
    kmeansAssignments(spark, sfDir).orderBy("vec_id")

  /** Session-cached persisted k-means model trained on the
    * existing-corpus split (vec_id % 10 != 0) — the nightly-retrain
    * artifact the incremental assign probes. */
  private def kmeansModelDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"kmeans|$sfDir") { dir =>
      val (model, _) = graft.ext.KMeans.train(
        emb(spark, sfDir).where(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", k = KMeansK, iters = KMeansIters)
      graft.ext.KMeans.writeModel(spark, model, dir)
    }

  /** Incremental k-means: the arriving shard (vec_id % 10 == 0)
    * assigned under the PERSISTED model — pure map-side (the centroids
    * load as k·dim longs and ride the plan as literals); the oracle
    * replays the split-train + shard-assign end-to-end. */
  def kmeansIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val model = graft.ext.KMeans.loadModel(spark, kmeansModelDir(spark, sfDir))
    graft.ext.KMeans.assign(
        graft.ext.KMeans.quantize(
          emb(spark, sfDir).where(col("vec_id") % 10 === 0),
          "vec_id", "embedding"),
        "vec_id", model)
      .orderBy("vec_id")
  }

  /** Per-cell occupancy + membership checksum of [[kmeansAssign]]. */
  def kmeansSizes(spark: SparkSession, sfDir: String): DataFrame =
    kmeansAssignments(spark, sfDir)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("id_checksum"))
      .orderBy("cell")

  /** The terminal training corpus: the whole cleaning pipeline composed
    * in ONE plan, cheap-to-expensive so each stage shrinks the next
    * one's input — (1) map-side quality filter (the [[qualityFilter]]
    * keep rules), (2) benchmark decontamination (broadcast 8-gram join,
    * [[decontam]]'s split), (3) exact dedup + near-dup CC collapse
    * ([[dedupCorpusCc]]'s semantics, pairs computed among the cleaned
    * survivors). Output = the (doc_id, lang, n_chars) a training run
    * would tokenize. Fully SQL-expressible — live oracle, no pins. */
  /** The cleaning pipeline's stage inputs, shared between the composed
    * [[cleanCorpus]] plan and the stage-isolated ladder timings
    * ([[cleanCorpusStageTimes]]) so the two can never drift. */
  private def cleanCorpusSplits(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    val d = docs(spark, sfDir)
    val bench = d.where(col("doc_id") % 17 === 0)
    val kept = d.where(col("doc_id") % 17 =!= 0)
      .where(TextStats.nWords(col("text")).cast("long") >= 20 &&
        col("n_chars") <= 450 && TextStats.stopwordRatio(col("text")) >= 0.02)
    (bench, kept)
  }

  def cleanCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val (bench, kept) = cleanCorpusSplits(spark, sfDir)
    // The cleaned set is scanned several times below (shingle self-join,
    // exact-dup grouping, survivor joins); materialize it once so the
    // quality+decontam subtree runs once per job, not per consumer. At
    // cluster scale this is the persisted intermediate between the
    // filter and dedup stages of the pipeline — Checkpoints.stage makes
    // it a durable checkpoint when the session selects reliable mode.
    // Anti-join on the contaminated ids instead of inner-joining the
    // clean side of the full report: decontaminate() also computes the
    // per-doc n_grams aggregate and left-joins it back across the whole
    // corpus just so this caller can re-filter — contaminatedIds skips
    // both (one fewer `kept` scan + one fewer doc-keyed aggregate;
    // identical clean set, spec-asserted in DecontaminationSpec).
    val clean = graft.util.Checkpoints.stage(
      kept.join(
        graft.ext.Decontamination.contaminatedIds(kept, bench, "doc_id", "text", n = 8),
        Seq("doc_id"), "left_anti"))
    // Stage the pair set too (guide §2.4 — second consumer of an
    // unmaterialized subtree = hidden recompute): dedupedCorpusCC
    // consumes `pairs` THREE times — once building the CC edge set and
    // twice more deriving the node set (pairs.select(id_a) UNION
    // pairs.select(id_b)) — and unstaged each consumer re-ran the whole
    // df-capped shingle self-join. The staged table is just the
    // qualifying (id_a, id_b, jaccard) rows, bounded by the near-dup
    // pair count, not the corpus.
    val pairs = graft.util.Checkpoints.stage(
      Dedup.jaccardPairs(clean, "doc_id", "text",
        n = 3, threshold = 0.5, maxDf = JaccardMaxDf))
    Dedup.dedupedCorpusCC(clean, "doc_id", "text", pairs)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** Stage-ISOLATED wall times of the cleaning pipeline, for the ladder
    * (the composed [[cleanCorpus]] plan is fixed-overhead-bound at
    * bench scale — dozens of stages, checkpoints, and an iterative CC
    * driver loop — so its end-to-end exponent says nothing about the
    * data-dependent terms; these do). Each stage's input is persisted
    * before its timing starts, so a stage's time is its OWN work:
    *  - `filter`: the map-side quality pass over the corpus;
    *  - `decontam`: the broadcast 8-gram benchmark join;
    *  - `pairs`: the df-capped shingle self-join over the cleaned set;
    *  - `cc_collapse`: connected components + survivor anti-joins.
    * Returns (stage, seconds, output rows) in pipeline order. The row
    * counts matter as much as the times: the ladder's replica rotation
    * decorrelates shingles but also destroys STOPWORD statistics, so
    * rotated replicas fail the stopword-ratio quality gate and the
    * post-filter corpus barely grows with the factor — visible here as
    * out-row counts, and the reason the composed rung's exponent says
    * nothing about dedup scaling on generated data. */
  private[graft] def cleanCorpusStageTimes(spark: SparkSession,
                                           sfDir: String): Seq[(String, Double, Long)] = {
    val (bench, kept) = cleanCorpusSplits(spark, sfDir)
    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val keptP = kept.persist()
    val (tFilter, nKept) = timed(keptP.count())
    // same anti-join form as the composed cleanCorpus plan (the two
    // must never drift — see cleanCorpusSplits)
    val cleanP = keptP.join(
      graft.ext.Decontamination.contaminatedIds(keptP, bench, "doc_id", "text", n = 8),
      Seq("doc_id"), "left_anti").persist()
    val (tDecontam, nClean) = timed(cleanP.count())
    val pairsP = Dedup.jaccardPairs(cleanP, "doc_id", "text",
      n = 3, threshold = 0.5, maxDf = JaccardMaxDf).persist()
    val (tPairs, nPairs) = timed(pairsP.count())
    val (tCc, nOut) = timed(
      Dedup.dedupedCorpusCC(cleanP, "doc_id", "text", pairsP).count())
    Seq(keptP, cleanP, pairsP).foreach(_.unpersist())
    Seq(("filter", tFilter, nKept), ("decontam", tDecontam, nClean),
      ("pairs", tPairs, nPairs), ("cc_collapse", tCc, nOut))
  }

  /** Persisted copy of the [[dedupCc]] OUTPUT (a few hundred (id, comp)
    * rows): `llm_dedup_cc` times the iterative CC pipeline itself;
    * derived rollups consume this cache so their reps measure their own
    * aggregation, not a second CC run (the [[minhashPairsCached]]
    * timing policy). */
  private def ccComponentsCached(spark: SparkSession, sfDir: String): DataFrame =
    cachedDF("cc_components", spark, sfDir)(
      Dedup.connectedComponents(cappedPairs(spark, sfDir)))

  /** Near-dup cluster size distribution over the SAME capped pair set as
    * [[dedupCc]]: (cluster_size, n_clusters) — the dup-mass histogram a
    * corpus audit reads before choosing a dedup strategy. Reuses the
    * shared persisted CC output; two tiny aggs on top. */
  def dedupClusterSizes(spark: SparkSession, sfDir: String): DataFrame =
    ccComponentsCached(spark, sfDir)
      .groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy("cluster_size")

  /** Corpus vocabulary health numbers (see [[TextStats.vocabStats]]). */
  def vocabStats(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.vocabStats(docs(spark, sfDir), "doc_id", "text")

  /** Cleaning-pass audit: original vs whitespace-normalized lengths per
    * doc ([[TextStats.cleanText]] is the op; the lengths prove it). */
  def cleanStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("raw_len"),
      length(TextStats.cleanText(col("text"))).cast("long").as("clean_len"))
    .orderBy("doc_id")

  /** Training-sequence packing: concat-then-chunk pack assignment over 8
    * shards with a 2048-token budget, rolled up per pack (see
    * [[graft.ext.Packing]]). */
  def packStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Packing.packs(docs(spark, sfDir), "doc_id", "text",
        nShards = 8, budgetTokens = 2048L)
      .orderBy("shard", "pack_id")

  /** Per-document BPE token counts against the fixture-trained merge
    * table (see [[graft.ext.Bpe]] — map-side encode, memoized per
    * distinct word; the oracle recomputes every count through the
    * rank-ordered `replace()` chain, so the encoder is hash-gated
    * bit-for-bit). */
  def bpeTokens(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Bpe.tokenCounts(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** WordPiece (BERT) token counts under the fixture vocabulary —
    * greedy longest-match with position-aware pieces and the [UNK]
    * collapse rule, hash-exact against the oracle's recursive-CTE
    * replay (see [[graft.ext.WordPiece]]). */
  def wordpieceTokens(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.WordPiece.tokenCounts(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** Token-exact packing twin: the same concat-then-chunk layout as
    * [[packStats]], budgeted in BPE tokens (what a real pretraining
    * data layout counts) instead of regex tokens. */
  def packStatsBpe(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Packing.packsCounts(
        graft.ext.Bpe.tokenCounts(docs(spark, sfDir), "doc_id", "text")
          .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens")),
        "doc_id", nShards = 8, budgetTokens = 2048L)
      .orderBy("shard", "pack_id")

  /** WordPiece-budgeted packing twin — the `llm_pack_stats` layout
    * with token counts from the greedy WordPiece encoder, completing
    * the tokenizer-budget family (regex / BPE / Unigram / WordPiece).
    * Same shards and budget, so the four layouts are comparable. */
  def packStatsWordpiece(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Packing.packsCounts(
        graft.ext.WordPiece.tokenCounts(docs(spark, sfDir), "doc_id", "text")
          .select(col("doc_id"), col("n_wp_tokens").as("n_tokens")),
        "doc_id", nShards = 8, budgetTokens = 2048L)
      .orderBy("shard", "pack_id")

  /** Cross-tokenizer packing reconciliation: the four budget layouts
    * (regex / BPE / Unigram / WordPiece — same shards, same 2048
    * budget) aggregated side by side. Every layout must pack every
    * document exactly once, so `n_docs` agrees across the four rows
    * (spec-asserted); the budgets differ only in what a "token" is —
    * the cheap audit a pretraining data layout runs before shipping
    * shards. Rides the four existing pack queries unchanged. */
  def packReconcile(spark: SparkSession, sfDir: String): DataFrame = {
    def arm(tok: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_packs"),
          sum("n_docs").as("n_docs"),
          sum("pack_tokens").as("sum_tokens"),
          max("pack_tokens").as("max_pack_tokens"))
        .select(lit(tok).as("tokenizer"), col("n_packs"), col("n_docs"),
          col("sum_tokens"), col("max_pack_tokens"))
    arm("bpe", packStatsBpe(spark, sfDir))
      .unionByName(arm("regex", packStats(spark, sfDir)))
      .unionByName(arm("unigram", packStatsUnigram(spark, sfDir)))
      .unionByName(arm("wordpiece", packStatsWordpiece(spark, sfDir)))
      .orderBy("tokenizer")
  }

  /** Document-boundary next-fit packing (no doc ever split across
    * sequences — see [[graft.ext.Packing.nextFitCounts]]); same shard
    * count and budget as `llm_pack_stats`, so the two layouts are
    * directly comparable. Fully live oracle: DuckDB replays the
    * sequential fold as a recursive CTE. */
  def packGreedy(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Packing.nextFitPacks(docs(spark, sfDir), "doc_id", "text",
        nShards = 8, budgetTokens = 2048L)
      .orderBy("shard", "pack_id")

  /** Best-fit-decreasing packing (Ding et al. 2024) — the bin table is
    * not SQL-restatable, so this row is rows-only and
    * [[packBestfitCheck]] carries its correctness. */
  def packBestfit(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Packing.bestFitPacks(docs(spark, sfDir), "doc_id", "text",
        nShards = 8, budgetTokens = 2048L)
      .orderBy("shard", "pack_id")

  /** The BFD gate row: live doc/token totals (the oracle recomputes
    * both) plus the three structural facts that pin best-fit between
    * its bounds — every multi-doc pack within budget, pack count ≤ the
    * oracle-replayed next-fit count, pack count ≥ the per-shard
    * ceil(tokens/budget) lower bound. A BFD bug that loses/duplicates a
    * doc, overfills a pack, or packs worse than next-fit flips a
    * column. */
  def packBestfitCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 2048L
    val counts = docs(spark, sfDir).select(col("doc_id"),
      TextStats.nTokens(col("text")).cast("long").as("n_tokens"))
    val bfd = graft.ext.Packing.bestFitCounts(counts, "doc_id",
      nShards = 8, budgetTokens = budget)
    val nf = graft.ext.Packing.nextFitCounts(counts, "doc_id",
      nShards = 8, budgetTokens = budget)
    val bfdPacks = bfd.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
    val bfdAgg = bfdPacks.agg(
      count(lit(1)).as("n_packs_bfd"),
      sum("n_docs").as("n_docs_bfd"),
      sum("pack_tokens").as("total_tokens"),
      max(when(col("pack_tokens") > budget && col("n_docs") > 1, 1L)
        .otherwise(0L)).as("overfull"))
    val nfAgg = nf.groupBy("shard", "pack_id").count()
      .agg(count(lit(1)).as("n_packs_nf"))
    // oversize docs pack alone ABOVE budget, so the valid bound is
    // n_oversize + ceil(rest / budget) per shard (no oversize docs
    // exist at the fixture budget, but the bound must hold regardless)
    val lb = counts
      .select(pmod(Sampling.bucket(col("doc_id")), lit(8)).as("shard"),
        col("n_tokens"))
      .groupBy("shard").agg(
        sum(when(col("n_tokens") > budget, 1L).otherwise(0L)).as("n_over"),
        sum(when(col("n_tokens") > budget, 0L).otherwise(col("n_tokens")))
          .as("t_rest"))
      .agg(sum(col("n_over") + expr(s"(t_rest + ${budget - 1}) DIV $budget"))
        .as("lower_bound"))
    val inAgg = counts.agg(count(lit(1)).as("n_docs"))
    bfdAgg.crossJoin(broadcast(nfAgg)).crossJoin(broadcast(lb))
      .crossJoin(broadcast(inAgg)) // all single-row planning joins
      .select(
        col("n_docs"), col("total_tokens"),
        (col("n_docs_bfd") === col("n_docs")).as("partition_exact"),
        (col("overfull") === 0L).as("within_budget_ok"),
        (col("n_packs_bfd") <= col("n_packs_nf")).as("le_nextfit_ok"),
        (col("n_packs_bfd") >= col("lower_bound")).as("ge_lowerbound_ok"))
  }

  /** Top-3 characteristic terms per doc (tf·N/df score, linear idf —
    * see [[TextStats.tfIdfTopTerms]]). */
  def tfIdfTopTerms(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.tfIdfTopTerms(docs(spark, sfDir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")

  /** The registered retrieval query: one rare term ("dup", df≈5% of
    * docs on the word-soup corpus) and three common ones, so the idf
    * spread, the tf saturation, and the length normalization all have
    * selectivity in the fixture. */
  val Bm25QueryTerms: Seq[String] = Seq("dup", "hash", "window", "merge")

  /** Per-doc BM25 scores for [[Bm25QueryTerms]] — integer-exact BIGINT
    * scoring end to end (see [[graft.ext.Bm25]]'s scaladoc for the
    * scaled kernel and the disclosed linear-idf trade). */
  def bm25Scores(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Bm25.scores(docs(spark, sfDir), "doc_id", "text",
        Bm25QueryTerms)
      .orderBy("doc_id")

  /** Top-25 BM25 retrieval (TakeOrdered selection, rank window over the
    * 25 survivors only). */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Bm25.topK(docs(spark, sfDir), "doc_id", "text",
        Bm25QueryTerms, k = 25)
      .orderBy("rank")

  /** Distributed BPE training over the corpus (vocabulary never
    * collected; one pair-count shuffle + a 1-row argmax collect per
    * round — see [[graft.ext.Bpe.trainDistributed]]). Fully live
    * oracle: DuckDB replays every round (pair counts → deterministic
    * argmax → one replace() rewrite) as chained CTEs, so the learned
    * merge table is bit-for-bit engine-reproducible. */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Bpe.trainDistributed(docs(spark, sfDir), "doc_id", "text",
        nMerges = graft.ext.Bpe.FixtureNMerges)
      .orderBy("rank")

  /** Self-trained tokenization: per-doc token counts under the
    * CORPUS-trained merge table — train → encode → count, every stage
    * live-oracled in one query (the oracle replays training as round
    * CTEs, then drives the replace()-chain encoder with the learned
    * pairs). The merge table is a bounded model collect (nMerges rows —
    * the centroid/codebook discipline). */
  def bpeSelfTok(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val merges = graft.ext.Bpe
      .trainDistributed(d, "doc_id", "text",
        nMerges = graft.ext.Bpe.FixtureNMerges)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.ext.Bpe.tokenCounts(d, "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  /** Unigram-LM (SentencePiece-style) tokenization under the frozen
    * fixture piece vocabulary — per-doc pre-token/piece counts and the
    * total integer Viterbi cost (see [[graft.ext.Unigram]]); the
    * oracle unrolls the DP by position, so the row is fully live. */
  def unigramTokens(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Unigram.tokenCounts(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** Distributed Unigram-LM training on the corpus itself (hard-EM +
    * true-loss prune + post-prune refit — [[graft.ext.Unigram]]
    * section doc): the learned (piece, cost) table. The oracle replays
    * EVERY round as chained CTEs (DP levels per position, the chosen
    * piece per (word, pos), backtrace as a recursive CTE, bitlen
    * refit), so the row is fully live and bit-exact. */
  def unigramTrain(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Unigram.trainDistributed(docs(spark, sfDir), "doc_id", "text",
      maxWordLen = graft.ext.Unigram.OracleDpLevels)
      .orderBy("piece")

  /** Train → Viterbi-encode the corpus with its OWN learned vocabulary
    * → per-doc counts, in one chain (the llm_bpe_selftok closure): the
    * end-to-end proof the learned model actually tokenizes. */
  def unigramSelftok(spark: SparkSession, sfDir: String): DataFrame = {
    val model = graft.ext.Unigram
      .trainDistributed(docs(spark, sfDir), "doc_id", "text",
        maxWordLen = graft.ext.Unigram.OracleDpLevels)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // bounded model
    graft.ext.Unigram.tokenCounts(docs(spark, sfDir), "doc_id", "text",
        pieces = model)
      .orderBy("doc_id")
  }

  /** Incremental unigram vocabulary refresh: the NEXT EM round's cost
    * table computed from per-slice usage counts merged monoidally —
    * two disjoint corpus halves segmented separately under the trained
    * model, usages unioned and re-summed, one bitlen refit. Counts are
    * a monoid under a FIXED cost table (the [[graft.ext.NaiveBayes]]
    * incremental discipline), so this equals the batch round exactly;
    * the oracle replays the full training chain plus that one extra
    * round in a single pass. */
  def unigramIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, sfDir)
    val model = graft.ext.Unigram
      .trainDistributed(d, "doc_id", "text",
        maxWordLen = graft.ext.Unigram.OracleDpLevels)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // bounded model
    val alphabet = model.keySet.filter(_.length == 1)
    val u1 = graft.ext.Unigram.usageCounts(
      d.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", model)
    val u2 = graft.ext.Unigram.usageCounts(
      d.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", model)
    val merged = u1.unionByName(u2)
      .groupBy("piece").agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // bounded
    graft.ext.Unigram.refit(merged, alphabet)
      .toSeq.sortBy(_._1).toDF("piece", "cost")
      .select(col("piece"), col("cost").cast("long").as("cost"))
      .orderBy("piece")
  }

  /** Piece-exact packing under the unigram tokenizer — the third
    * tokenizer through the same generalized [[graft.ext.Packing]]
    * layout (regex, BPE, unigram), same shards/budget as the others. */
  def packStatsUnigram(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Packing.packsCounts(
        graft.ext.Unigram.tokenCounts(docs(spark, sfDir), "doc_id", "text")
          .select(col("doc_id"), col("n_pieces").as("n_tokens")),
        "doc_id", nShards = 8, budgetTokens = 2048L)
      .orderBy("shard", "pack_id")

  /** Standing phrase set for the verbatim-occurrence audit: a 3-gram,
    * a repeated-word 2-gram (multiple occurrences per doc, incl.
    * overlapping runs), a zero-match phrase, and a case+whitespace
    * normalization arm ("Spark  WINDOW" must match "spark window").
    * Measured present at the gated sfs (phrase 1 appears from sf0.01
    * up; overlap counting itself is spec-pinned on a hand fixture). */
  val PhraseFixture: Seq[(Long, String)] = Seq(
    1L -> "slow hash batch",
    2L -> "slow slow",
    3L -> "window fast query",
    4L -> "quantum flux capacitor",
    5L -> "Spark  WINDOW")

  /** Exact phrase occurrences per (phrase, doc) — every verbatim match
    * with its first word offset (see [[graft.ext.PhraseSearch]]);
    * fully live oracle matching gram TEXT (the engine matches
    * fingerprints, so the hash also witnesses fp↔text agreement). */
  def phraseCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ext.PhraseSearch.phraseCounts(docs(spark, sfDir), "doc_id",
        "text", PhraseFixture.toDF("phrase_id", "phrase"))
      .orderBy("phrase_id", "doc_id")
  }

  /** Per-phrase corpus rollup, zero-match phrases included. */
  def phraseStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ext.PhraseSearch.phraseStats(docs(spark, sfDir), "doc_id",
        "text", PhraseFixture.toDF("phrase_id", "phrase"))
      .orderBy("phrase_id")
  }

  /** The registered standing-query table for batch retrieval: three
    * queries sharing terms (so the fan-out join has selectivity) with
    * a deliberate duplicate row (1, "hash") the dedup must collapse. */
  val Bm25MultiQueries: Seq[(Long, String)] = Seq(
    1L -> "dup", 1L -> "hash", 1L -> "hash",
    2L -> "window", 2L -> "merge", 2L -> "scan",
    3L -> "dup", 3L -> "query")

  /** Batch retrieval: top-10 per standing query in one corpus pass
    * (see [[graft.ext.Bm25.topKMany]]) — fully live oracle. */
  def bm25Multi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ext.Bm25.topKMany(docs(spark, sfDir), "doc_id", "text",
        Bm25MultiQueries.toDF("query_id", "term"), k = 10)
      .orderBy("query_id", "rank")
  }

  /** Hybrid lexical+vector retrieval — THE modern retrieval shape: the
    * BM25 keyword ranking fused with a reference embedding's cosine
    * ranking (query vector = vec_id 7, its self-match excluded) by
    * integer reciprocal-rank fusion over top-100 pools. Fully live
    * oracle: the lexical side is the BM25 CTE chain, the vector side
    * the round-6 `list_cosine_similarity` ranking the cosine family
    * already gates. */
  def hybridFusion(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val e = emb(spark, sfDir)
    val cos = Similarity
      .bruteForceTopK(e, e.where(col("vec_id") === 7), "vec_id",
        "embedding", k = 100)
      .select(col("neighbor_id").as("doc_id"), col("sim").as("score_u"))
    graft.ext.Bm25.rrfFuse("doc_id", poolK = 100, k = 25, lists = Seq(
        "bm25" -> graft.ext.Bm25.scores(d, "doc_id", "text", Bm25QueryTerms),
        "cos" -> cos))
      .select(col("doc_id"),
        coalesce(col("rank_bm25"), lit(0L)).as("rank_bm25"),
        coalesce(col("rank_cos"), lit(0L)).as("rank_cos"),
        col("rrf_u"), col("rank"))
      .orderBy("rank")
  }

  /** Session-cached BM25 postings index over the existing-corpus split
    * (doc_id % 10 != 0), term-bucketed so the gated query exercises the
    * partition-pruned probe path. */
  private def bm25IndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"bm25|$sfDir") { dir =>
      graft.ext.IncrementalBm25.writeIndex(
        docs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", dir, termBuckets = 16)
    }

  /** Incremental BM25: the arriving shard folded into the persisted
    * postings index, then the registered query served FROM the index.
    * Gated on the IDENTICAL oracle SQL as [[bm25TopK]] (the shared-SQL
    * pattern): df/N/T folded across epochs must equal the full-corpus
    * recompute bit-for-bit, so a green hash proves the postings/stats
    * round-trip AND the pruned-probe arithmetic. */
  def bm25Incremental(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = bm25IndexDir(spark, sfDir)
    graft.ext.IncrementalBm25.appendToIndex(
      docsShard(spark, sfDir).where(col("doc_id") % 10 === 0),
      "doc_id", "text", dir, epoch = "shard0")
    graft.ext.IncrementalBm25.search(spark, dir, Bm25QueryTerms, k = 25)
      .orderBy("rank")
  }

  /** Hybrid-retrieval fusion: reciprocal-rank fusion of the BM25 and
    * linear-tf·idf rankings over the same query, top-100 pools, top-25
    * fused (see [[graft.ext.Bm25.rrfFuse]]). */
  def rrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    graft.ext.Bm25.rrfFuse("doc_id", poolK = 100, k = 25, lists = Seq(
        "bm25" -> graft.ext.Bm25.scores(d, "doc_id", "text", Bm25QueryTerms),
        "lin" -> graft.ext.Bm25.tfIdfScores(d, "doc_id", "text", Bm25QueryTerms)))
      // absent-from-pool ranks surface as 0, not NULL — unambiguous
      // (ranks are 1-based) and keeps the oracle compare null-free
      .select(col("doc_id"),
        coalesce(col("rank_bm25"), lit(0L)).as("rank_bm25"),
        coalesce(col("rank_lin"), lit(0L)).as("rank_lin"),
        col("rrf_u"), col("rank"))
      .orderBy("rank")
  }

  /** Shared capped pair set (Jaccard ≥ 0.5, df-capped): [[dedupCorpus]]
    * and [[dedupCc]] consume the IDENTICAL pair plan, so the first
    * caller per (session, sfDir) runs the shingle self-join once and
    * persists the (id_a, id_b, jaccard) result via [[cachedDF]]. */
  private def cappedPairs(spark: SparkSession, sfDir: String): DataFrame =
    cachedDF("capped_jaccard", spark, sfDir)(
      Dedup.jaccardPairs(docs(spark, sfDir), "doc_id", "text",
        n = 3, threshold = 0.5, maxDf = JaccardMaxDf))

  /** The pipeline-terminal dedup: the corpus a training run would
    * actually consume — exact dups collapsed to min-id survivors, then
    * near-dup (Jaccard ≥ 0.5) losers dropped greedily by id. */
  def dedupCorpus(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.dedupedCorpus(docs(spark, sfDir), "doc_id", "text",
        cappedPairs(spark, sfDir))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** Connected components over the same capped near-dup pair graph as
    * [[dedupCorpus]]: (doc_id, comp) with comp = min id of the cluster,
    * via bounded-iteration large-star/small-star. The oracle recomputes
    * components with a recursive CTE over the identical pair set, so the
    * iterative DataFrame algorithm is hash-checked end to end. */
  def dedupCc(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.connectedComponents(cappedPairs(spark, sfDir))
      .select(col("id").as("doc_id"), col("comp"))
      .orderBy("doc_id")

  /** The CC-collapsed terminal corpus over the same shared pair set —
    * the principled upgrade of [[dedupCorpus]]'s greedy drop (see
    * [[Dedup.dedupedCorpusCC]]); oracle = the recursive-CTE components
    * feeding the identical survivor selection. */
  def dedupCorpusCc(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.dedupedCorpusCC(docs(spark, sfDir), "doc_id", "text",
        cappedPairs(spark, sfDir))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** Winnowing fingerprint counts per doc (rows-only: xxhash64 values
    * are engine-specific; the substring-sharing guarantee is asserted in
    * WinnowingSpec). */
  def winnowFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Winnowing.fingerprints(docs(spark, sfDir), "doc_id", "text")
      .groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints"))
      .orderBy("doc_id")

  /** Docs sharing winnowed fingerprints — substring-level copy
    * candidates (rows-only). k=24 chars ≈ a 4-5 word span: on this
    * small-vocabulary corpus shorter grams are near-universal (k=8
    * admitted 30% of ALL pairs); word-soup docs only share 24-char runs
    * when actually copied. */
  def winnowSharedPairs(spark: SparkSession, sfDir: String): DataFrame =
    Winnowing.sharedFingerprintPairs(docs(spark, sfDir), "doc_id", "text",
        k = 24, w = 4, minShared = 4, maxDf = 200)
      .orderBy("id_a", "id_b")

  /** SimHash fingerprint checksum under the driver gate: the 64-bit
    * fingerprints are deterministic given the xxhash64 seeds, so their
    * xor/min/max are pinnable per scale factor (xor because a sum of
    * 64-bit fingerprints overflows; bit_xor is order-independent and
    * merges map-side) while the document count is live. `n_docs` counts
    * ALL documents and `n_fingerprinted` the docs that produced a
    * fingerprint (token-less docs drop out of [[Dedup.simhash]]'s
    * token aggregation) — keeping the live oracle column honest instead
    * of relying on a no-empty-docs fixture invariant.
    * [[simhashParity]] gates the PAIR semantics (blocking == brute
    * force); this row pins the fingerprint VALUES, so a hash or
    * tokenizer drift is visible even when it perturbs both sides of
    * the parity equally. */
  def simhashChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = Dedup.simhash(docs(spark, sfDir), "doc_id", "text")
      .agg(
        count(lit(1)).as("n_fingerprinted"),
        expr("bit_xor(simhash)").as("fp_xor"),
        min(col("simhash")).as("fp_min"),
        max(col("simhash")).as("fp_max"))
    docs(spark, sfDir).agg(count(lit(1)).as("n_docs")).crossJoin(fp)
  }

  /** Winnowing checksum under the driver gate: `n_docs` counts ALL
    * documents live (mirroring [[simhashChecksum]] — it does not lean on
    * the fixture invariant that every doc is long enough for the k=24
    * window), while `n_fingerprinted`, the fingerprint totals, and the
    * shared-pair count are deterministic given the rolling-hash
    * constants (pinned per scale factor). A short/empty doc therefore
    * shows up as a pin drift in `n_fingerprinted`, not a misleading
    * live-column mismatch. The per-doc histogram and the pair list stay
    * rows-only in [[winnowFingerprints]] / [[winnowSharedPairs]]; this
    * row makes a changed hash constant, window, or df-cap a visible
    * hash mismatch. */
  def winnowChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    // aggregate over the REGISTERED queries themselves, not a parallel
    // re-derivation: if winnowFingerprints / winnowSharedPairs are ever
    // re-tuned, this checksum follows them by construction
    val fps = winnowFingerprints(spark, sfDir)
      .agg(count(lit(1)).as("n_fingerprinted"),
        sum("n_fingerprints").as("total_fingerprints"),
        max("n_fingerprints").as("max_per_doc"))
    val pairs = winnowSharedPairs(spark, sfDir)
      .agg(count(lit(1)).as("n_shared_pairs"))
    docs(spark, sfDir).agg(count(lit(1)).as("n_docs"))
      .crossJoin(fps).crossJoin(pairs)
  }

  /** Embedding-cosine near-duplicate pairs (LSH candidates + exact
    * verify; recall property covered by scalatest, rows-only here). */
  def cosineNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.cosineNearDups(embWide(spark, sfDir), "vec_id", "embedding",
        threshold = 0.35) // testdata max pairwise cosine ≈0.51; 0.35 yields a real pair set
      .orderBy("id_a", "id_b")

  /** The SCALE-preset near-dup (12 planes × 8 tables) — the configuration
    * you'd actually run at 100 TB, where the candidate prune must prune
    * (spec-measured ≥10× fewer candidates than the recall preset). On
    * this isotropic corpus the aggressive prune admits few pairs by
    * design, so the query emits EVERY surviving candidate with its exact
    * verified cosine plus the near-dup flag — the candidate set IS the
    * observable the scale claim rests on (rows-only; the recall/prune
    * properties live in SimilaritySpec). */
  def cosineNearDupScale(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.cosineNearDups(embWide(spark, sfDir), "vec_id", "embedding",
        threshold = -1.0, // keep all verified candidates; flag the dups
        nPlanes = Similarity.ScaleNPlanes, tables = Similarity.ScaleTables)
      .withColumn("is_neardup", col("sim") >= 0.35)
      .orderBy("id_a", "id_b")

  /** Real-image fixture blobs: genuine PNG (even ids) / BMP (odd ids)
    * bytes encoded by JDK `ImageIO` with dimensions and pixels that are
    * pure functions of `doc_id` — the SQL-restatable contract the mm_*
    * oracles recompute ([[Multimodal.pixelValue]]). */
  private def imageBlobs(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.synthesizeImages(spark, docs(spark, sfDir).select("doc_id"), "doc_id")

  /** Perceptual hash over the real decoded rasters (see
    * [[Multimodal.averageHash]]) — integer-exact, so the oracle
    * recomputes every hash from the pixel formula; fully live. */
  def mmPhash(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.imagePhash(spark, imageBlobs(spark, sfDir), "doc_id", "blob")
      .select("doc_id", "phash")
      .orderBy("doc_id")

  /** Image near-dup pairs over the dup-planted fixture (ids ≡ 5 mod 10
    * are one-pixel-perturbed copies of id−5): blocked pigeonhole
    * candidates + exact Hamming ≤ 3; the oracle computes the same
    * hashes from the formula and joins ALL pairs — proving the blocked
    * join loses nothing inside the radius. */
  def mmPhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val blobs = Multimodal.synthesizeImagesWithDups(
      spark, docs(spark, sfDir).select("doc_id"), "doc_id")
    Multimodal.phashNearDups(
        Multimodal.imagePhash(spark, blobs, "doc_id", "blob"),
        "doc_id", maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** Magic-byte routing over a MIXED blob column (see
    * [[Multimodal.sniffFormat]]): real png/bmp/wav/avi/mp4 bytes, route
    * sniffed from the first bytes; the oracle restates the route from
    * the id formula, so a green hash proves the real containers carry
    * the magics the sniffer claims. n_bytes stays engine-side only
    * (container sizes aren't SQL-restatable) — the format column is
    * the gate. */
  def mmSniffFormats(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.sniffFormats(spark,
        Multimodal.synthesizeMixedBlobs(spark,
          docs(spark, sfDir).select("doc_id"), "doc_id"),
        "doc_id", "blob")
      .select("doc_id", "format")
      .orderBy("doc_id")

  /** Dup-fixture pHashes for an id subset (decode map-side; failed
    * decodes carry no image signature so they never reach the index or
    * the probe — fixture blobs all decode, but the contract holds). */
  private def phashesOf(spark: SparkSession, ids: DataFrame): DataFrame =
    Multimodal.imagePhash(spark,
        Multimodal.synthesizeImagesWithDups(spark, ids, "doc_id"),
        "doc_id", "blob")
      .where(col("decoded"))
      .select("doc_id", "phash")

  /** Session-cached pHash block index over the non-batch images (the
    * fingerprint-level [[graft.ext.IncrementalSimHash]] — the index is
    * agnostic to where the 64 bits came from). */
  private def phashIncIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"phash|$sfDir") { dir =>
      graft.ext.IncrementalSimHash.writeIndexFingerprints(
        phashesOf(spark,
          docs(spark, sfDir).where(col("doc_id") % 10 =!= 5).select("doc_id")),
        "doc_id", "phash", dir, maxHamming = 3, blockPartitions = 16)
    }

  /** Incremental image dedup: the arriving shard (ids ≡ 5 mod 10 — the
    * planted near-copies) probed against the persisted pHash index.
    * FULLY live oracle (unlike the text-simhash twin's parity gate):
    * the oracle recomputes every pHash from the pixel formula and joins
    * ALL batch-touching pairs at Hamming ≤ 3. */
  def mmPhashIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalSimHash.nearDupPairsFingerprints(spark,
        phashIncIndexDir(spark, sfDir),
        phashesOf(spark,
          docs(spark, sfDir).where(col("doc_id") % 10 === 5).select("doc_id")),
        "doc_id", "phash")
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")

  /** Multimodal metadata decode over REAL image bytes: `ImageIO`
    * header-only probe (format/width/height without raster decode — the
    * O(1) metadata path for a 100 TB blob scan) inside the
    * per-partition-batched `mapPartitions` plumbing. The oracle
    * recomputes the fixture formulas over `doc_id`; a green hash means
    * the real PNG and BMP encode→decode round trips are exact. */
  def mmDecodeMeta(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.decodeMeta(spark, imageBlobs(spark, sfDir), "doc_id", "blob")
      .select(col("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("doc_id")

  /** Multimodal resize over REAL image bytes: decode → bilinear
    * `AffineTransformOp` scale to 16×12 → re-encode PNG → header-decode
    * back. The live oracle pins the full chain's metadata; the resized
    * PIXELS are gated by [[mmResizeChecksum]]. */
  def mmResizeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val resized = Multimodal.resizeImages(spark, imageBlobs(spark, sfDir),
      "doc_id", "blob", targetW = 16, targetH = 12)
    Multimodal.decodeMeta(spark, resized, "doc_id", "blob_resized")
      .select(col("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("doc_id")
  }

  /** Real pixel feature extraction: full `ImageIO` raster decode →
    * exact per-channel sums. Long sums (not doubles) so the DuckDB
    * oracle recomputes them EXACTLY from the pixel formula — the
    * hash-gated proof that the codec path is pixel-perfect, not just
    * header-correct. */
  def mmImageFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.imageChannelSums(spark, imageBlobs(spark, sfDir), "doc_id", "blob")
      .select(col("doc_id"), col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("doc_id")

  /** Resize gate row: `n_docs` live (all documents, crossJoined the
    * [[simhashChecksum]] way); the XOR of per-image bilinear-resized
    * pixel checksums and the count of images that decoded are
    * deterministic for this JDK → pinned per scale factor. A codec,
    * interpolation, or raster-type drift flips `resized_xor`. */
  def mmResizeChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    val resized = Multimodal.resizeImages(spark, imageBlobs(spark, sfDir),
      "doc_id", "blob", targetW = 16, targetH = 12)
    val sums = Multimodal.imageChecksums(spark, resized, "doc_id", "blob_resized")
      .agg(
        // DECODED images only (width 0 marks an undecodable blob), so a
        // decode regression shows as n_resized drifting under n_docs —
        // count(*) would equal n_docs unconditionally and gate nothing
        count(when(col("width") > 0, 1)).as("n_resized"),
        expr("bit_xor(checksum)").as("resized_xor"),
        sum(when(col("width") === 16 && col("height") === 12, 1L).otherwise(0L))
          .as("n_target_dims"))
    docs(spark, sfDir).agg(count(lit(1)).as("n_docs")).crossJoin(sums)
  }

  /** Multimodal → similarity composition: real image decode → exact
    * channel-sum features → cosine top-3 neighbors per query image.
    * The whole chain is LIVE-oracled: the sums are exact integers
    * (≤ ~1.2e5, products ≤ 4.5e10 — all under 2^53, so doubles are
    * exact), sqrt/division are IEEE-correctly-rounded, and both engines
    * evaluate the same left-associated expression → bit-identical sims,
    * no rounding needed. Scale shape: the 20-query side broadcasts; the
    * corpus features never shuffle until the tiny (queries × corpus)
    * sim rows hit the per-query window. */
  def mmFeatureTopK(spark: SparkSession, sfDir: String): DataFrame = {
    def features(blobs: DataFrame): DataFrame =
      Multimodal.imageChannelSums(spark, blobs, "doc_id", "blob")
        .select(col("doc_id"),
          col("sum_r").cast("double").as("r"),
          col("sum_g").cast("double").as("g"),
          col("sum_b").cast("double").as("b"))
    // Zero-norm guard: an undecodable blob degrades to all-zero channel
    // sums (the imageChannelSums contract), whose cosine is 0/0 = NaN —
    // and Spark sorts NaN ABOVE every double, so one bad blob would
    // silently rank as the top-1 neighbor of every query. Zero-norm
    // features are unrankable; drop them on both sides (the oracle SQL
    // carries the same predicate, and the synthetic corpus has no
    // zero-norm images, so the gate rows are unchanged).
    def rankable(df: DataFrame): DataFrame =
      df.where(col("r") * col("r") + col("g") * col("g") +
        col("b") * col("b") > 0d)
    val f = rankable(features(imageBlobs(spark, sfDir)))
    // The query side filters BEFORE the synthesize/decode
    // mapPartitions: the codec chain is opaque to Catalyst, so a
    // post-decode `where` on `f` would re-synthesize and re-decode the
    // whole corpus just to keep 20 rows. Decoding a doc_id twice (once
    // per side) is deterministic, so results are identical either way.
    val q = rankable(features(Multimodal.synthesizeImages(spark,
        docs(spark, sfDir).select("doc_id").where(col("doc_id") < 20), "doc_id")))
      .select(col("doc_id").as("query_id"), col("r").as("qr"),
        col("g").as("qg"), col("b").as("qb"))
    val sim = (col("qr") * col("r") + col("qg") * col("g") + col("qb") * col("b")) /
      (sqrt(col("qr") * col("qr") + col("qg") * col("qg") + col("qb") * col("qb")) *
        sqrt(col("r") * col("r") + col("g") * col("g") + col("b") * col("b")))
    val scored = f.join(broadcast(q), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"), sim.as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .orderBy("query_id", "rank")
  }

  /** Real audio metadata: genuine 16-bit mono PCM WAV bytes written by
    * `javax.sound.sampled.AudioSystem` and header-parsed back
    * (`getAudioFileFormat` — no sample decode). Frame count
    * `800 + (doc_id%100)*8` at 8 kHz ⇒ `duration_ms = 100 + doc_id%100`,
    * the SQL-restatable contract the oracle recomputes. */
  /** Full PCM decode gate (see [[Multimodal.audioSampleSums]]): exact
    * sample sums the oracle recomputes from the fixture formula. */
  def mmAudioSampleSums(spark: SparkSession, sfDir: String): DataFrame = {
    val wavs = Multimodal.synthesizeWavs(spark,
      docs(spark, sfDir).select("doc_id"), "doc_id")
    Multimodal.audioSampleSums(spark, wavs, "doc_id", "blob")
      .orderBy("doc_id")
  }

  def mmAudioMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val wavs = Multimodal.synthesizeWavs(spark, docs(spark, sfDir).select("doc_id"), "doc_id")
    Multimodal.audioMeta(spark, wavs, "doc_id", "blob")
      .select(col("doc_id"), col("format"),
        col("channels").cast("long").as("channels"),
        col("sample_rate"), col("n_frames"), col("duration_ms"))
      .orderBy("doc_id")
  }

  /** Real video CONTAINER metadata: genuine AVI/RIFF bytes written and
    * chunk-walk parsed by [[Multimodal]] (public byte format — the JDK
    * lacks only the CODEC, not the container). `n_frames` comes from
    * the avih header, `n_frames_demuxed` from counting the actual
    * '00db' chunks in the movi list — the live oracle pins both to the
    * fixture formula, so a header/content disagreement (a demux bug)
    * breaks the hash. */
  def mmVideoMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val avis = Multimodal.synthesizeAvis(spark,
      docs(spark, sfDir).select("doc_id"), "doc_id")
    Multimodal.videoMeta(spark, avis, "doc_id", "blob")
      .select(col("doc_id"), col("container"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames"), col("n_frames_demuxed"), col("duration_ms"))
      .orderBy("doc_id")
  }

  /** Real frame DEMUX: every movi '00db' chunk payload extracted from
    * genuine AVI bytes, with the per-frame byte SUM — restatable from
    * the payload formula, so the live oracle hash-gates the demuxer's
    * chunk boundaries and payload bytes exactly (an off-by-one in the
    * chunk walk or the word-alignment padding breaks the sum). */
  def mmVideoFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val avis = Multimodal.synthesizeAvis(spark,
      docs(spark, sfDir).select("doc_id").where(col("doc_id") < 100), "doc_id")
    Multimodal.aviFrameStats(spark, avis, "doc_id", "blob")
      .orderBy("doc_id", "frame_idx")
  }

  /** Real MP4/ISO-BMFF metadata: spec-valid bytes synthesized from the
    * shared video fixture formulas, box-walk parsed back — brand,
    * movie-header timescale/duration, track count, tkhd 16.16
    * dimensions, stsz sample count, and the actual mdat payload length
    * as the header-vs-content cross-check. Live oracle (every field
    * restates a fixture formula). */
  def mmMp4Meta(spark: SparkSession, sfDir: String): DataFrame = {
    val mp4s = Multimodal.synthesizeMp4s(spark,
      docs(spark, sfDir).select("doc_id"), "doc_id")
    Multimodal.mp4Meta(spark, mp4s, "doc_id", "blob")
      .select(col("doc_id"), col("brand"), col("timescale"),
        col("duration_ms"), col("n_tracks"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_samples"), col("mdat_bytes"))
      .orderBy("doc_id")
  }

  /** Real MP4 sample DEMUX: every sample payload sliced out of genuine
    * ISO-BMFF bytes by the stsz/stsc/stco sample tables, with per-sample
    * byte sums restated by the oracle from the payload formula — the
    * hash gate on the sample-table arithmetic (the MP4 counterpart of
    * [[mmVideoFrames]]). */
  def mmMp4Samples(spark: SparkSession, sfDir: String): DataFrame = {
    val mp4s = Multimodal.synthesizeMp4s(spark,
      docs(spark, sfDir).select("doc_id").where(col("doc_id") < 100), "doc_id")
    Multimodal.mp4SampleStats(spark, mp4s, "doc_id", "blob")
      .orderBy("doc_id", "sample_idx")
  }

  /** Avro object-container round-trip (see [[graft.ext.AvroIo]]): corpus
    * → per-partition `.avro` container files on the Hadoop FS seam →
    * `binaryFile` + `DataFileStream` read back → hash-gate against the
    * ORIGINAL parquet table (the jsonl/ORC/CSV oracle pattern). Proves
    * type-exact round-tripping through the row-interchange container
    * format, including null handling via union schemas. */
  def avroRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-avro").toString
    val d = docs(spark, sfDir)
    graft.ext.AvroIo.write(d.repartition(4), dir)
    graft.ext.AvroIo.read(spark, dir, d.schema)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** TFRecord round-trip — the accelerator-feed container (tf.train
    * .Example protobuf in CRC32C-framed records, see
    * [[graft.ext.TfRecordIo]]): corpus → shard files → binaryFile
    * parse (CRCs verified) → corpus. Original-table oracle, the
    * avro/jsonl/ORC/CSV pattern: a green hash proves the varint,
    * protobuf and framing layers byte-exactly. */
  def tfrecordRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-tfrecord").toString
    val d = docs(spark, sfDir)
    graft.ext.TfRecordIo.write(d.repartition(4), dir)
    graft.ext.TfRecordIo.read(spark, dir, d.schema)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Same through TFRecordOptions-GZIP whole-file compression (the
    * writer names the shard `.tfrecord.gz` and the reader keys
    * decompression off the extension — framing is byte-ambiguous with
    * the gzip magic, so sniffing is only a legacy fallback) — shares
    * the original-table oracle, the `warc_gz_roundtrip` pattern. */
  def tfrecordGzRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-tfrecord-gz").toString
    val d = docs(spark, sfDir)
    graft.ext.TfRecordIo.write(d.repartition(4), dir, codec = "gzip")
    graft.ext.TfRecordIo.read(spark, dir, d.schema)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Same through zstd whole-file compression (`.tfrecord.zst`,
    * extension-keyed like the gz twin; zstd-jni ships with Spark) —
    * shares the original-table oracle. */
  def tfrecordZstRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-tfrecord-zst").toString
    val d = docs(spark, sfDir)
    graft.ext.TfRecordIo.write(d.repartition(4), dir, codec = "zstd")
    graft.ext.TfRecordIo.read(spark, dir, d.schema)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** TFRecord round-trip with the read schema INFERRED from the shards
    * themselves ([[graft.ext.TfRecordIo.inferSchema]] — the
    * reference's per-batch schema-inference theme, `glue/cdc_hudi
    * .py:234`, applied to the container): no schema is supplied to the
    * reader; inference yields the list-superset view (the Example
    * encoding cannot distinguish scalars from 1-element lists), and
    * `element_at(c, 1)` recovers the scalar columns losslessly —
    * hash-gated against the ORIGINAL table like every roundtrip. */
  def tfrecordInferredRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-tfrecord-infer").toString
    val d = docs(spark, sfDir)
    graft.ext.TfRecordIo.write(d.repartition(4), dir)
    val st = graft.ext.TfRecordIo.inferSchema(spark, dir)
    graft.ext.TfRecordIo.read(spark, dir, st)
      .select(
        element_at(col("doc_id"), 1).as("doc_id"),
        element_at(col("text"), 1).cast("string").as("text"),
        element_at(col("lang"), 1).cast("string").as("lang"),
        element_at(col("source"), 1).cast("string").as("source"),
        element_at(col("n_chars"), 1).as("n_chars"))
      .orderBy("doc_id")
  }

  /** The training-shard DELIVERY chain end-to-end — what an LLM data
    * pipeline actually hands the trainer: concat-then-chunk packing
    * assigns documents to fixed-token-budget packs
    * ([[graft.ext.Packing.concatChunk]], the llm_pack_stats layout),
    * each pack's token-id sequences concatenate IN DOC ORDER into one
    * `input_ids` list, packs ship as TFRecord Examples (`int64_list`
    * of ~2048 ids — the accelerator feed), and verification reads the
    * shards BACK and derives every output column from the read bytes:
    * list length, id checksum, and a POSITION-WEIGHTED checksum that
    * pins concatenation order (a shuffled sequence with the same ids
    * fails the gate). The oracle restates all of it live from the
    * original table — shard scramble, running offsets, within-pack
    * offsets, per-token fingerprint ids. Per-pack state is bounded by
    * the token budget, so the collect_list is the pack, never the
    * corpus. */
  def tfrecordPackChain(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-tfrecord-pack").toString
    val d = docs(spark, sfDir)
    val docIds = d.select(col("doc_id"),
      graft.ext.TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        expr("transform(toks, (t, i) -> CAST(length(t) AS BIGINT) * 1000003 + i)")
          .as("ids"))
    val assigned = graft.ext.Packing.concatChunk(d, "doc_id", "text",
      nShards = 8, budgetTokens = 2048L)
    val packsDf = assigned.join(docIds, "doc_id")
      .select(col("shard").cast("long").as("shard"),
        col("pack_id").cast("long").as("pack_id"),
        col("doc_id"), col("ids"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        collect_list(struct(col("doc_id"), col("ids"))).as("parts"))
      .select(col("shard"), col("pack_id"), col("n_docs"),
        expr("flatten(transform(sort_array(parts), s -> s.ids))").as("input_ids"))
    graft.ext.TfRecordIo.write(packsDf.repartition(4), dir)
    val back = graft.ext.TfRecordIo.read(spark, dir, packsDf.schema)
    back.select(col("shard"), col("pack_id"), col("n_docs"),
        size(col("input_ids")).cast("long").as("n_ids"),
        expr("aggregate(input_ids, CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("id_checksum"),
        expr("CASE WHEN size(input_ids) = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "aggregate(zip_with(input_ids, sequence(CAST(0 AS BIGINT), " +
          "CAST(size(input_ids) - 1 AS BIGINT)), (x, p) -> x * p), " +
          "CAST(0 AS BIGINT), (a, y) -> a + y) END").as("pos_checksum"))
      .orderBy("shard", "pack_id")
  }

  /** TFRecord round-trip of the REAL LLM payload — LIST features: a
    * token-id sequence (`int64_list` of many ids per example, the
    * packed-batch column every TPU-era corpus ships), the token
    * strings (`bytes_list`) and a parallel float list, one Example per
    * document. Every list element is exploded back out after the trip
    * so the oracle restates each (doc, pos, token, id, weight) tuple
    * from the ORIGINAL table — a green hash proves multi-value
    * encode/decode element-exactly, including empty lists (docs whose
    * text yields no tokens round-trip as present-but-empty arrays and
    * contribute no exploded rows on either side). Token ids are a
    * shared-arithmetic fingerprint (`len(tok)·1000003 + pos`) both
    * engines compute identically. */
  def tfrecordTokensRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = CdcQueries.tempSinkDir("graft-tfrecord-tokens").toString
    val base = docs(spark, sfDir)
      .select(col("doc_id"), graft.ext.TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        expr("transform(toks, (t, i) -> CAST(length(t) AS BIGINT) * 1000003 + i)")
          .as("ids"),
        expr("transform(toks, t -> CAST(length(t) AS FLOAT))").as("tfs"))
    graft.ext.TfRecordIo.write(base.repartition(4), dir)
    val back = graft.ext.TfRecordIo.read(spark, dir, base.schema)
    back.select(col("doc_id"),
        posexplode(arrays_zip(col("toks"), col("ids"), col("tfs"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.toks").as("tok"), col("col.ids").as("tok_id"),
        col("col.tfs").as("tf"))
      .orderBy("doc_id", "pos")
  }

  // --- sliding-window chunking (ext/Chunker.scala) ------------------

  /** Char-window chunking parameters for the registered rows: 200-char
    * windows every 150 chars (25% overlap — the common RAG default
    * shape). Interpolated into the oracle so both engines share them. */
  val ChunkCharW = 200
  val ChunkCharS = 150

  /** Token-window parameters: 32 whitespace tokens every 24. */
  val ChunkTokW = 32
  val ChunkTokS = 24

  /** RAG char-window chunking — every (doc, window) chunk row with its
    * byte-exact text, fully restated by the oracle via
    * generate_series + substr. */
  def chunkChars(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Chunker.charChunks(docs(spark, sfDir), "doc_id", "text",
        ChunkCharW, ChunkCharS)
      .orderBy("doc_id", "chunk_id")

  /** RAG token-window chunking (whitespace tokens, single-space
    * rejoin) — chunk text byte-exact in both engines. */
  def chunkTokens(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Chunker.tokenChunks(docs(spark, sfDir), "doc_id", "text",
        ChunkTokW, ChunkTokS)
      .orderBy("doc_id", "chunk_id")

  /** Per-document chunk roll-up over the token-window table. */
  def chunkStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Chunker.stats(
        graft.ext.Chunker.tokenChunks(docs(spark, sfDir), "doc_id", "text",
          ChunkTokW, ChunkTokS),
        "doc_id", "n_chunk_tokens")
      .orderBy("doc_id")

  // --- content-defined chunking (ext/GearChunk.scala) ---------------

  /** Blob source for the CDC family: the corpus text as binary (the
    * [[mmFrameSample]] convention — blob length restatable live as
    * `octet_length(encode(text))`, and the fixture's planted exact
    * duplicates give the dedup row genuine shared chunks). */
  private def cdcBlobs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"),
      col("text").cast("binary").as("blob"))

  /** Reassembly-integrity gate for gear CDC, computed in the same
    * single pass as the chunking itself: chunk lens contiguous + sum
    * to blob length + sha256(concat chunks) == sha256(blob). Fully
    * live oracle (it only needs the blob lengths). */
  def cdcRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.GearChunk.roundtrip(cdcBlobs(spark, sfDir), "doc_id", "blob")
      .orderBy("doc_id")

  /** The content-defined chunk table (gear-dependent offsets/digests —
    * rows-only, gated by `mm_cdc_roundtrip`). */
  def cdcChunks(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.GearChunk.chunks(cdcBlobs(spark, sfDir), "doc_id", "blob")
      .orderBy("doc_id", "chunk_idx")

  /** Corpus dedup accounting over the chunk table: logical vs stored
    * bytes after digest-level dedup (gated by `mm_cdc_roundtrip`). */
  def cdcDedupStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.GearChunk.dedupStats(
      graft.ext.GearChunk.chunks(cdcBlobs(spark, sfDir), "doc_id", "blob"))

  /** HLL precision for the persisted-sketch rows (must match between
    * the store and any single-pass comparison sketch). */
  val HllLgK = 12

  /** Session-cached HLL sketch store over the existing-events split
    * (event_id % 10 != 0): distinct user_id per event_type (see
    * [[graft.ext.IncrementalDistinct]]). */
  private def hllIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"hll|$sfDir") { dir =>
      graft.ext.IncrementalDistinct.writeIndex(
        CdcQueries.events(spark, sfDir).where(col("event_id") % 10 =!= 0),
        "event_type", "user_id", dir, lgK = HllLgK)
    }

  /** Incremental distinct users per event type: the arriving batch
    * (event_id % 10 == 0) sketched once and unioned with the persisted
    * epoch sketches — O(batch) work for an all-time distinct (rows-only:
    * sketch estimates; gated by `events_distinct_incremental_check`). */
  def eventsDistinctIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalDistinct.estimate(spark,
        hllIndexDir(spark, sfDir),
        CdcQueries.events(spark, sfDir).where(col("event_id") % 10 === 0),
        "event_type", "user_id")
      .orderBy("event_type")

  /** Gate for [[eventsDistinctIncremental]]: (a) the union of the
    * stored split sketch and the batch sketch must equal a single-pass
    * sketch over ALL events group-for-group (HLL merge is register-wise
    * max — lossless for same-lgK sketches), and (b) every estimate
    * sits within the 5% envelope of the exact distinct. n_types and
    * the exact sum are live in the oracle. */
  def eventsDistinctIncrementalCheck(spark: SparkSession,
      sfDir: String): DataFrame = {
    val inc = eventsDistinctIncremental(spark, sfDir)
      .withColumnRenamed("distinct_est", "__inc")
    val all = CdcQueries.events(spark, sfDir)
    val full = all.groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(HllLgK))).as("__full"))
    val exact = all.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("__exact"))
    inc.join(full, "event_type").join(exact, "event_type")
      .agg(
        count(lit(1)).cast("long").as("n_types"),
        count(when(col("__inc") =!= col("__full"), 1))
          .cast("long").as("n_merge_mismatch"),
        count(when(abs(col("__inc") - col("__exact")) >
          col("__exact") * 0.05, 1)).cast("long").as("n_outside_5pct"),
        sum("__exact").cast("long").as("sum_exact"))
  }

  /** Per-stratum exact-k sample size for the registered row. */
  val StratifiedK = 20

  /** Exact-k stratified sample: 20 docs per language, selected by the
    * deterministic key hash (see [[graft.ext.Sampling.stratifiedK]]) —
    * skew-safe two-phase ranking, provably the plain
    * `row_number() <= k` window the oracle runs. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.Sampling.stratifiedK(docs(spark, sfDir), "doc_id", "lang",
        k = StratifiedK)
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .orderBy("lang", "sample_rank")

  /** Top-N size for the vocabulary coverage curve row. */
  val VocabTopN = 50

  /** Vocabulary coverage curve (see [[graft.ext.TextStats
    * .vocabCoverage]]): top-50 word types with cumulative corpus
    * coverage in integer ppm — fully live oracle. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.TextStats.vocabCoverage(docs(spark, sfDir), "text", VocabTopN)
      .orderBy("rank")

  /** Session-cached gear-chunk store over the existing-corpus split
    * (doc_id % 10 != 0) — the persisted side of the incremental CDC
    * rows (see [[graft.ext.IncrementalGearChunk]]). */
  private def cdcIndexDir(spark: SparkSession, sfDir: String): String =
    incIndexDir(spark, s"gearchunk|$sfDir") { dir =>
      graft.ext.IncrementalGearChunk.writeIndex(
        cdcBlobs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "blob", dir)
    }

  /** Incremental CDC dedup accounting: the arriving blobs
    * (doc_id % 10 == 0) chunked once map-side and judged against the
    * persisted chunk store — bytes already stored vs bytes this batch
    * adds (rows-only: digests are gear-dependent; gated by
    * `mm_cdc_incremental_check`). */
  def cdcIncremental(spark: SparkSession, sfDir: String): DataFrame =
    graft.ext.IncrementalGearChunk.newBytes(spark,
        cdcIndexDir(spark, sfDir),
        cdcBlobs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "blob")
      .orderBy("doc_id")

  /** Parity gate for [[cdcIncremental]]: the store-probe path must
    * equal a from-scratch recompute (chunk BOTH splits live, dup iff
    * the digest appears in the existing split) — full-outer compare,
    * zero mismatches; `sum_blob_bytes` is live-restatable from the
    * text lengths, pinning the chunker's byte accounting too. */
  def cdcIncrementalCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val inc = cdcIncremental(spark, sfDir)
    val indexedDigests = graft.ext.GearChunk.chunks(
        cdcBlobs(spark, sfDir).where(col("doc_id") % 10 =!= 0),
        "doc_id", "blob")
      .select("chunk_sha256").distinct().withColumn("__dup", lit(true))
    val brute = graft.ext.GearChunk.chunks(
        cdcBlobs(spark, sfDir).where(col("doc_id") % 10 === 0),
        "doc_id", "blob")
      .join(indexedDigests, Seq("chunk_sha256"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("b_n_chunks"),
        count(when(col("__dup"), 1)).as("b_n_dup_chunks"),
        sum("chunk_bytes").as("b_blob_bytes"),
        coalesce(sum(when(col("__dup"), col("chunk_bytes"))), lit(0L))
          .as("b_dup_bytes"),
        coalesce(sum(when(col("__dup").isNull, col("chunk_bytes"))), lit(0L))
          .as("b_new_bytes"))
    inc.join(brute, Seq("doc_id"), "full_outer")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        count(when(
          col("n_chunks").isNull || col("b_n_chunks").isNull ||
            col("n_chunks") =!= col("b_n_chunks") ||
            col("n_dup_chunks") =!= col("b_n_dup_chunks") ||
            col("blob_bytes") =!= col("b_blob_bytes") ||
            col("dup_bytes") =!= col("b_dup_bytes") ||
            col("new_bytes") =!= col("b_new_bytes"), 1))
          .cast("long").as("n_mismatch"),
        sum("blob_bytes").cast("long").as("sum_blob_bytes"))
  }

  /** Multimodal frame sampling: 4 evenly-spaced 16-byte windows per blob
    * (rows-only; the slicing shape is what a real frame sampler uses). */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.sampleFrames(
        docs(spark, sfDir).select(col("doc_id"),
          col("text").cast("binary").as("blob")),
        "doc_id", "blob", n = 4, frameBytes = 16)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame_bytes")).cast("long").as("frame_len"))
      .orderBy("doc_id", "frame_idx")
}
