package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash-LSH, and SimHash. Extensions beyond the reference
  * (SURVEY.md §2.8 north star).
  *
  * Scale design (the 100 TB contract):
  *  - exact dedup is a single hash aggregate on a content digest — one
  *    shuffle of (digest, doc_id), with map-side partial aggregation;
  *  - near-dup NEVER does an all-pairs cartesian product. Candidate pairs
  *    come from an inverted-index / banded-signature join: explode to
  *    (bucket_key, doc_id), shuffle on bucket_key, and only co-bucketed
  *    docs pair up. Cost is driven by bucket occupancy, not n².
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups: one survivor (min id) per distinct content.
    * At scale, group on a fixed-width digest of the content rather than
    * shuffling full document bodies. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ---------------------------------------- word shingles (shared infra)

  /** Distinct word n-gram shingles per doc: (id, shingle). The explode is
    * map-side; downstream joins shuffle on the shingle/bucket, never on
    * the full text. Docs shorter than n words yield no shingles (the
    * guard matters: `sequence(0, size-n)` would otherwise produce a
    * descending sequence and feed `slice` illegal starts). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // TextStats.WsRun, not Java `\s`: the oracle splits with RE2's
    // `\s` = [\t\n\f\r ], which excludes \x0B (see TextStats.WsChars).
    // The split is MATERIALIZED as its own projection: an expression
    // captured inside a higher-order-function lambda is re-evaluated
    // PER ELEMENT (the regex split ran once per window — measured ~3.6×
    // on the span-dedup twin of this shape), while an attribute
    // reference reads the row buffer. CollapseProject keeps the
    // boundary because the attribute is referenced more than once.
    val w = col("__graft_ws")
    val grams = when(size(w) >= n,
        transform(
          sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col(idCol),
        split(trim(lower(col(textCol))), TextStats.WsRun).as("__graft_ws"))
      .select(col(idCol), explode(array_distinct(grams)).as("shingle"))
  }

  // ------------------------------------------------- exact n-gram Jaccard

  /** The df-cap applied to a shingle stream — shared by the exact
    * [[jaccardPairs]] and the MinHash verify path so the two sides of
    * the recall gate cap IDENTICALLY (an uncapped verify against a
    * capped exact side would let a hot-shingle corpus produce pairs the
    * exact side excludes, breaking the subset property structurally).
    * Window count, not agg+join-back: ONE shuffle on shingle (which the
    * inverted-index self-joins need anyway, so the partitioning is
    * reused) instead of a second scan + join of the full shingle
    * stream. The count is per-partition after the shuffle; no
    * driver-side or broadcast state, so an adversarial corpus with MANY
    * hot shingles still streams. */
  private def cappedShingles(sh: DataFrame, idCol: String,
                             maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue) sh
    else {
      import org.apache.spark.sql.expressions.Window
      sh.withColumn("__df",
          count(lit(1)).over(Window.partitionBy("shingle")))
        .where(col("__df") <= maxDf)
        .select(col(idCol), col("shingle"))
    }

  /** All pairs with word-n-gram Jaccard >= threshold, via inverted-index
    * self-join: docs sharing at least one shingle become candidates;
    * intersection counts come from the join group sizes; union sizes from
    * per-doc shingle counts. Exact (100% recall for threshold > 0) and
    * never all-pairs — only co-shingled docs meet. Returned pairs are
    * canonical (id_a < id_b) with the exact jaccard value.
    *
    * 100 TB note: a stopword-like shingle shared by every doc makes its
    * bucket quadratic; cap bucket width by dropping shingles with document
    * frequency above `maxDf` ([[cappedShingles]] — sacrifices recall only
    * for pairs whose ONLY common shingle is near-universal; at a sane
    * threshold those pairs are far below it anyway). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    val filtered = cappedShingles(shingles(docs, idCol, textCol, n), idCol, maxDf)
    val sizes = filtered.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = filtered.select(col(idCol).as("id_a"), col("shingle"))
    val b = filtered.select(col(idCol).as("id_b"), col("shingle"))
    val inter = a.join(b, "shingle")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------- prefix-filtered exact Jaccard

  /** Prefix rows of a (capped) shingle stream: each doc keeps only its
    * `|d| - ceil(t*|d|) + 1` RAREST shingles under the global
    * (document-frequency, shingle) total order, tagged with the doc's
    * full shingle count `n_sh`.
    *
    * Why this loses nothing (the AllPairs / prefix-filtering principle,
    * Bayardo et al. WWW'07; Chaudhuri et al. ICDE'06): J(A,B) >= t
    * implies |A∩B| >= t·|A| and >= t·|B| (substitute |B| >= |A∩B| into
    * the Jaccard bound). The prefix principle says that if
    * |A∩B| >= α then the (|A|-α+1)-prefix of A intersects the
    * (|B|-α+1)-prefix of B under ANY shared total order; using the
    * per-side α_x = ceil(t·|x|) <= α only LENGTHENS each prefix, so
    * every qualifying pair still collides on at least one indexed
    * shingle. Rarest-first ordering makes the kept shingles the most
    * selective ones, which is where the candidate reduction comes from.
    *
    * The rank condition is expressed WITHOUT ceil():
    * rank <= n - ceil(t·n) + 1  ⇔  n - rank + 1 >= ceil(t·n)  ⇔
    * n - rank + 1 >= t·n (LHS integral); the 1e-9 slack guards the
    * binary-representation drift of t·n (0.12·25 evaluates to
    * 3.0000000000000004) from ever SHORTENING a prefix — slack can only
    * lengthen it, which is recall-safe. */
  def prefixShingles(sh: DataFrame, idCol: String,
                     threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The df window re-uses the shingle-hash partitioning the maxDf cap
    // (and the downstream inverted-index join) already shuffle on; the
    // two doc-keyed windows (count + row_number) share ONE id shuffle.
    val byDoc = Window.partitionBy(idCol)
    val ranked = sh
      .withColumn("__gdf", count(lit(1)).over(Window.partitionBy("shingle")))
      .withColumn("n_sh", count(lit(1)).over(byDoc))
      .withColumn("__rnk",
        row_number().over(byDoc.orderBy(col("__gdf"), col("shingle"))))
    ranked
      .where((col("n_sh") - col("__rnk") + 1).cast("double") >=
        lit(threshold) * col("n_sh").cast("double") - lit(1e-9))
      .select(col(idCol), col("shingle"), col("n_sh"))
  }

  /** Candidate pairs from the prefix index: docs whose PREFIXES share a
    * shingle, pruned by the length filter (J >= t forces
    * min(|A|,|B|) >= |A∩B| >= t·max(|A|,|B|)). Strict superset of the
    * qualifying pairs, usually far smaller than the full co-shingled
    * candidate set. */
  def prefixCandidates(pre: DataFrame, idCol: String,
                       threshold: Double): DataFrame = {
    val a = pre.select(col(idCol).as("id_a"), col("shingle"),
      col("n_sh").as("n_a"))
    val b = pre.select(col(idCol).as("id_b"), col("shingle"),
      col("n_sh").as("n_b"))
    a.join(b, "shingle")
      .where(col("id_a") < col("id_b"))
      .where(least(col("n_a"), col("n_b")).cast("double") >=
        lit(threshold) * greatest(col("n_a"), col("n_b")).cast("double") -
          lit(1e-9))
      .select("id_a", "id_b").distinct()
  }

  /** [[jaccardPairs]] with prefix filtering: IDENTICAL output (the
    * driver gates `llm_neardup_jaccard_prefix` and the full-join twin
    * `llm_neardup_jaccard_hi` on one shared oracle SQL), but candidate
    * pairs come from the prefix index instead of the full inverted
    * index, and only candidates are verified — the classic exact
    * set-similarity-join upgrade for workloads whose cost floor is
    * pair generation.
    *
    * 100 TB shape: the prefix keeps ~(1-t) of each doc's shingles, and
    * because they are the globally RAREST ones, bucket occupancy in the
    * candidate join collapses (a near-universal shingle is the LAST
    * thing a prefix keeps — this filter replaces the `maxDf` cap's
    * recall sacrifice at high t). Verification touches only candidate
    * pairs via the same never-all-pairs inverted-index shape as
    * [[minhashNearDups]].
    *
    * THRESHOLD DECIDES THE PLAN (measured, sf0.1 local[32]): at the
    * production near-dup threshold t=0.8 uncapped, the candidate
    * stream is 43.5k pairs vs the full join's 1.27M (29×) and
    * wall-clock wins 2.0 s vs 3.1 s; at an exploratory t=0.12 the
    * prefix keeps 88% of shingles and the two extra shuffles (df +
    * rank windows) cost more than the 1.4× candidate reduction buys
    * (8.9 s vs 2.1 s capped). Use [[jaccardPairs]] below ~t=0.5 and
    * this above. */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.5,
                         maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = cappedShingles(shingles(docs, idCol, textCol, n), idCol, maxDf)
    val cands = prefixCandidates(prefixShingles(sh, idCol, threshold),
      idCol, threshold)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    // Same verify shape as minhashNearDups: expand candidates by side
    // A's shingles, join side B on (id_b, shingle) — proportional to
    // candidate count, never |A|×|B| per pair.
    val inter = cands
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ----------------------------------------------------------- MinHash-LSH

  /** MinHash signature columns: sig_i = min over shingles of a 64-bit hash
    * seeded by i. One hash aggregate computes all k minimums (map-side
    * partial min), so the signature pass is a single shuffle of
    * (doc_id, k longs). */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"sig_$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded bucket keys of a signature table: (id, band, bucket) — the
    * LSH postings [[minhashCandidates]] self-joins, and the rows the
    * incremental signature index persists
    * ([[IncrementalMinHash.writeIndex]]): a FIXED `bands` rows per doc,
    * independent of document length. */
  def minhashBuckets(sigs: DataFrame, idCol: String,
                     bands: Int, rows: Int): DataFrame = {
    val bandKeys = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"sig_$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    sigs.select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.bucket"))
  }

  /** Banded-LSH candidate pairs: split the k-wide signature into `bands`
    * bands of `rows` values, hash each band to a bucket, explode to
    * (band, bucket, doc_id), and self-join per bucket. Docs with Jaccard j
    * collide in at least one band with prob 1-(1-j^rows)^bands — the
    * classic S-curve; no all-pairs comparison ever happens. */
  def minhashCandidates(sigs: DataFrame, idCol: String,
                        bands: Int, rows: Int): DataFrame = {
    val buckets = minhashBuckets(sigs, idCol, bands, rows)
    val a = buckets.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = buckets.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** End-to-end MinHash-LSH near-dup: candidates from banded LSH, then
    * exact-Jaccard verification of ONLY the candidates (the verify join is
    * proportional to candidate count, not n²). `maxDf` caps the shingle
    * stream exactly like [[jaccardPairs]]' cap (same helper), so a
    * capped exact baseline and this verify agree on the Jaccard of
    * every pair — the found set is a STRUCTURAL subset of the capped
    * exact set, the invariant the `llm_minhash_recall` gate pins. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 16, rows: Int = 4,
                      threshold: Double = 0.5,
                      maxDf: Long = Long.MaxValue): DataFrame = {
    // No persist here: this function only BUILDS a plan (a persist would
    // be unpersisted before the caller ever runs an action, caching
    // nothing). The repeated shingle subtrees below shuffle on the same
    // keys, so AQE's ReusedExchange deduplicates the physical scans.
    val sh = cappedShingles(shingles(docs, idCol, textCol, n), idCol, maxDf)
    val cands = minhashCandidates(minhashSignatures(sh, idCol, bands * rows),
      idCol, bands, rows)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    // Intersection via the same inverted-index shape as jaccardPairs:
    // expand candidates by side A's shingles, then join side B on
    // (id_b, shingle) — never the |A|×|B| per-pair cross product.
    val inter = cands
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------- corpus materialization

  /** The deduplicated corpus: exact-duplicate groups collapse to their
    * min-id survivor, then near-duplicate pairs (from any pair source —
    * exact Jaccard or MinHash) greedily drop the higher id of each pair.
    * Greedy-by-id is the standard one-pass policy (connected components
    * would need iteration; for near-dup thresholds high enough to mean
    * "same document", greedy keeps exactly the per-cluster min id when
    * the cluster is a clique, and never drops two docs for one pair).
    *
    * Scale shape: one anti-join of ids against the pair losers (bounded
    * by pair count, not corpus size) after the exact-dedup aggregate. */
  def dedupedCorpus(docs: DataFrame, idCol: String, textCol: String,
                    nearDupPairs: DataFrame): DataFrame = {
    val survivors = exact(docs, idCol, textCol).select(idCol)
    val losers = nearDupPairs.select(col("id_b").as(idCol)).distinct()
    docs.join(survivors, idCol) // exact survivors only
      .join(losers, Seq(idCol), "left_anti") // minus near-dup losers
  }

  // ------------------------------------------------- connected components

  /** Connected components of the near-dup pair graph: (id, comp) for
    * every node appearing in `pairs`, where `comp` is the component's
    * minimum id. Alternating large-star / small-star (the MapReduce CC
    * algorithm of Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — each round is two hash aggregates + joins over
    * the edge list, state lives entirely in the edge DataFrame, and the
    * round count is O(log²) in component size, NOT O(diameter) like
    * naive label propagation. This is the standard 100 TB upgrade over
    * [[dedupedCorpus]]'s greedy pair-drop, which under-collapses
    * non-clique clusters (A~C, B~C keeps both A and B).
    *
    * Scale notes: every round ends in a lineage-truncating checkpoint
    * ([[graft.util.Checkpoints.stage]]: executor-local by default,
    * config-selectable reliable checkpoint for fault-tolerant long
    * runs) — iterative self-referencing plans otherwise grow an
    * exponentially deep lineage that stalls the analyzer long before
    * the data is big. Convergence
    * is detected by an (edge-count, sum(u), sum(v)) signature — one
    * 3-long-row action per round, a bounded planning decision like AQE
    * stats — CONFIRMED by an exact set-equality check when the signature
    * matches (signatures can collide between distinct edge sets; the
    * exact check is paid once, at the true fixpoint). Fails loudly (not
    * silently wrong) if `maxIter` rounds don't
    * converge; near-dup graphs converge in a handful (log² of the
    * largest cluster). */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 32): DataFrame =
    connectedComponentsWithRounds(pairs, idA, idB, maxIter)._1

  /** [[connectedComponents]] plus the number of large-star/small-star
    * rounds it took to reach the fixpoint — the observability handle the
    * convergence-bound tests pin. A near-dup graph takes a handful of
    * rounds; a LONG PATH is the adversarial case, needing ~log2(diameter)
    * + fixpoint detection — the 10k-node chain takes exactly 15 rounds
    * (measured, pinned in DedupSpec). The default `maxIter = 32` gives
    * that worst case 2× headroom (each extra round roughly doubles the
    * path length handled) and costs converged graphs nothing — the loop
    * exits at the fixpoint, not at the cap. */
  def connectedComponentsWithRounds(pairs: DataFrame, idA: String = "id_a",
                                    idB: String = "id_b",
                                    maxIter: Int = 32): (DataFrame, Int) = {
    var edges = pairs
      .select(greatest(col(idA), col(idB)).as("u"),
        least(col(idA), col(idB)).as("v"))
      .where(col("u") =!= col("v")).distinct()
    edges = graft.util.Checkpoints.stage(edges)
    def signature(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(col("u").cast("long")), lit(0L)),
        coalesce(sum(col("v").cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var sig = signature(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: around each node u (symmetric view), link every
      // STRICTLY LARGER neighbor v to m = min(neighbors ∪ {u}). Output
      // edges are big→small (v > u >= m), preserving components.
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(lsMins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // SMALL-STAR: edges are already directed big→small, so grouping by
      // the big endpoint u sees only smaller neighbors; link them (and u)
      // to their minimum m.
      val ssMins = ls.groupBy("u").agg(min("v").as("m"))
      val withM = ls.join(ssMins, "u")
      val ss = graft.util.Checkpoints.stage(
        withM.select(col("u"), col("m").as("v"))
          .union(withM.where(col("v") =!= col("m"))
            .select(col("v").as("u"), col("m").as("v")))
          .distinct())
      val next = signature(ss)
      // The signature is only a FAST-PATH hint: two different edge sets
      // can share (count, sum(u), sum(v)). Convergence is confirmed by
      // exact set equality (both sides are distinct, counts are equal
      // when the signatures match, so an empty except ⇒ same set) —
      // paid only when signatures collide, normally once at the true
      // fixpoint.
      converged = next == sig && ss.exceptAll(edges).isEmpty
      sig = next
      edges = ss
      iter += 1
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds " +
        "(raise maxIter, or check the graph for an adversarially long " +
        "path — convergence needs ~log2(diameter) + a few rounds)")
    // At the fixpoint the edge set is a star per component (non-root →
    // component min); roots map to themselves. min() guards the last
    // pre-convergence shape where a node could briefly hold two parents.
    val nodes = pairs.select(col(idA).as("id"))
      .union(pairs.select(col(idB).as("id"))).distinct()
    (nodes.join(
        edges.groupBy(col("u").as("id")).agg(min("v").as("root")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("comp")),
      iter)
  }

  /** [[dedupedCorpus]] with component-exact collapsing: each connected
    * component of the near-dup graph keeps exactly its min-id member
    * (greedy pair-drop keeps one doc per PAIR-loser set, which
    * over-keeps non-clique clusters). Same one-anti-join scale shape —
    * the non-root set is bounded by the pair-graph node count. */
  def dedupedCorpusCC(docs: DataFrame, idCol: String, textCol: String,
                      nearDupPairs: DataFrame): DataFrame = {
    val survivors = exact(docs, idCol, textCol).select(idCol)
    val nonRoots = connectedComponents(nearDupPairs)
      .where(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(survivors, idCol)
      .join(nonRoots, Seq(idCol), "left_anti")
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc: sign-aggregate each bit of the token hashes.
    * Computed as 64 conditional sums inside ONE hash aggregate — single
    * shuffle of (doc_id, 64 ints); near-dups are pairs within a Hamming
    * ball, found by bucketing on bit-blocks (pigeonhole), not all-pairs. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextStats.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col(idCol), fp.as("simhash"))
  }

  /** Pigeonhole block keys of a fingerprint table: (id, simhash, blk,
    * v) — `maxHamming + 1` rows per doc. Shared by the in-corpus
    * [[simhashNearDups]] self-join and the incremental index
    * ([[IncrementalSimHash]]), which persists exactly these rows. */
  def simhashBlocks(fps: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val blockCols = (0 until blocks).map { bIdx =>
      val shiftBits = bIdx * width
      val w = if (bIdx == blocks - 1) 64 - shiftBits else width
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      struct(lit(bIdx).as("blk"),
        shiftright(col("simhash"), shiftBits).bitwiseAND(mask).as("v"))
    }
    fps.select(col(idCol), col("simhash"),
        explode(array(blockCols: _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.blk"), col("b.v"))
  }

  /** SimHash near-dup candidates within `maxHamming` bits, via pigeonhole
    * blocking: split 64 bits into (maxHamming+1) blocks — any pair within
    * the ball agrees exactly on at least one block, so bucketing on block
    * value has 100% recall. Hamming distance verified on candidates. */
  def simhashNearDups(fps: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    val exploded = simhashBlocks(fps, idCol, maxHamming)
    val a = exploded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("blk"), col("v"))
    val b = exploded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("blk"), col("v"))
    val ham = bit_count(col("sh_a").bitwiseXOR(col("sh_b")))
    a.join(b, Seq("blk", "v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), ham.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
