package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization, registered-domain extraction, and per-domain
  * frequency caps — the RefinedWeb (Penedo et al. 2023) / FineWeb
  * (Penedo et al. 2024) URL-level cleaning stage every web-scale corpus
  * runs before text-level filters: canonicalize the `WARC-Target-URI`
  * so syntactic variants of one page collapse to one key, group pages
  * by registered domain (eTLD+1), and cap how many documents any single
  * domain may contribute (FineWeb's "limit per domain" rule against
  * SEO farms that would otherwise dominate the corpus). Extension
  * beyond the reference (SURVEY.md §2.8 north star); in production the
  * URL column comes straight from [[Warc.parseWet]]'s target URI.
  *
  * Scale design (the 100 TB contract): [[canonicalize]], [[host]], and
  * [[registeredDomain]] are pure per-row projections — chains of
  * codegen'd `regexp_replace`/`regexp_extract` inside whole-stage
  * codegen, no shuffle, no UDF, no state. The only shuffling member is
  * the per-domain cap, and web domains are the canonical skew case
  * (a crawl's top domain holds millions of pages while the median holds
  * one), so [[capPerDomain]] is two-phase: a salted local top-N first
  * (bounds every domain to `cap × salts` rows regardless of raw skew),
  * then the exact window over the bounded survivors. The two-phase form
  * is exact, not approximate — a row outside its salt's top-`cap` has
  * `cap` rows ahead of it within one salt, hence `cap` rows ahead of it
  * globally, so it can never enter the global top-`cap` (the classic
  * top-K pushdown argument).
  *
  * Canonicalization rules (each a regex with identical Java/RE2
  * semantics so the DuckDB oracle restates them verbatim):
  *   1. drop the fragment (`#…`);
  *   2. lowercase the scheme+authority prefix (path/query case kept —
  *      paths are case-sensitive, hosts are not, RFC 3986 §6.2.2.1);
  *   3. strip default ports (`:443` for https, `:80` for http);
  *   4. strip a leading `www.` label;
  *   5. drop tracking query params (`utm_*`, `fbclid`, `gclid`) while
  *      keeping the rest in original order;
  *   6. strip an empty trailing `?` and a trailing path slash.
  */
object UrlOps {

  /** Tracking-parameter names removed by rule 5 — the FineWeb/CCNet
    * set: Google Analytics' `utm_*` family plus the Facebook/Google
    * click ids. Kept as one alternation so both engines compile one
    * automaton. */
  val TrackingParamRe = "(utm_[a-z]+|fbclid|gclid)"

  /** Two-label public suffixes recognized by [[registeredDomain]] —
    * a compact subset of the Mozilla Public Suffix List covering the
    * common ccTLD second-level registries. At production scale the
    * full PSL (~9k suffixes) ships the same way: a literal set inside
    * the expression (it broadcasts with the plan; no join needed). */
  val TwoLabelSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "gov.uk", "org.uk",
        "com.au", "net.au", "org.au",
        "co.jp", "or.jp", "ne.jp",
        "co.in", "com.br", "com.cn", "co.kr")

  /** Rules 1–6 as one codegen'd expression chain. Idempotent: every
    * rule's output no longer matches its own pattern. */
  def canonicalize(url: Column): Column = {
    // 1. fragment off first so later end-anchored rules see the real end
    val noFrag = regexp_replace(url, "#.*$", "")
    // 2. lowercase scheme://host[:port] — everything before the first
    //    path slash; the path/query tail is appended unchanged
    val prefix = regexp_extract(noFrag, "^[^/]*//[^/]*", 0)
    val lowered = concat(lower(prefix),
      substring(noFrag, length(prefix) + 1, lit(Int.MaxValue)))
    // 3. default ports (group 2 may not participate → empty, both engines)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2"),
      "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    // 4. www
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // 5. tracking params: a RUN of "param=value&" anchored to a real
    //    param boundary ([?&] — an unanchored pattern would also eat the
    //    tail of e.g. "xutm_b=2&"), consumed as one match so consecutive
    //    tracking params cannot hide behind a consumed separator; then
    //    one trailing "?param=value" / "&param=value" with its separator
    val noTrackMid = regexp_replace(noWww,
      "([?&])(" + TrackingParamRe + "=[^&#]*&)+", "$1")
    val noTrack = regexp_replace(noTrackMid, "[?&]" + TrackingParamRe + "=[^&#]*$", "")
    // 6. empty trailing '?', then trailing path slashES ("p/?q" → "p?q",
    //    "p//" → "p" — the + keeps the rule idempotent in one pass)
    val noEmptyQ = regexp_replace(noTrack, "\\?$", "")
    regexp_replace(regexp_replace(noEmptyQ, "/+\\?", "?"), "/+$", "")
  }

  /** Hostname of an already-[[canonicalize]]d URL (no port, no www). */
  def host(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z]+://([^/:?#]+)", 1)

  /** Registered domain (eTLD+1): the last two host labels, or the last
    * three when the last two form a known public suffix (`co.uk` etc.,
    * [[TwoLabelSuffixes]]). A bare two-label host under a two-label
    * suffix (`co.uk` itself) falls back to the host unchanged. */
  def registeredDomain(hostCol: Column): Column = {
    val lastTwo = regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    val lastThree = regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(lastTwo.isInCollection(TwoLabelSuffixes) && lastThree =!= "", lastThree)
      .otherwise(lastTwo)
  }

  /** FineWeb per-domain cap: keep at most `cap` rows per `domainCol`,
    * best-first under the total order `ord` (pass a deterministic
    * tie-broken ordering, e.g. `quality DESC, doc_id` — required for
    * the two-phase form to be exact). Two-phase against domain skew:
    * phase 1 ranks within (domain, salt) — an ordinary hash-partitioned
    * window whose heaviest partition holds ~1/`salts` of the heaviest
    * domain — and keeps each salt's top `cap`, which bounds every
    * domain to `cap × salts` survivors; phase 2 ranks the survivors
    * exactly. Equivalent to a single `row_number() ≤ cap` window (the
    * oracle's form) for any total order. */
  def capPerDomain(df: DataFrame, domainCol: Column, ord: Seq[Column],
                   cap: Int, salts: Int = 16): DataFrame = {
    require(cap > 0 && salts > 0)
    val salted = df.withColumn("__salt",
      (spark_partition_id() % salts).cast("int"))
    val local = Window.partitionBy(domainCol, col("__salt")).orderBy(ord: _*)
    val bounded = salted
      .withColumn("__lrk", row_number().over(local))
      .where(col("__lrk") <= cap)
      .drop("__lrk", "__salt")
    val global = Window.partitionBy(domainCol).orderBy(ord: _*)
    bounded
      .withColumn("__rk", row_number().over(global))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }
}
