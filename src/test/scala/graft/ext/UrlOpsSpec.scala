package graft.ext

import graft.SparkSpecBase

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpecBase {

  private def canonOne(url: String): String = {
    val s = spark; import s.implicits._
    Seq(url).toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"))
      .collect()(0).getString(0)
  }

  private def domainOne(url: String): String = {
    val s = spark; import s.implicits._
    Seq(url).toDF("url")
      .select(UrlOps.registeredDomain(
        UrlOps.host(UrlOps.canonicalize(col("url")))).as("d"))
      .collect()(0).getString(0)
  }

  test("every rule at once: case, default port, www, tracking, slash, fragment") {
    assert(canonOne(
      "HTTPS://WWW.Example.COM:443/Path/A/?utm_source=x&id=7&utm_medium=m#frag")
      === "https://example.com/Path/A?id=7")
  }

  test("path and query case are preserved; only scheme+authority lowercases") {
    assert(canonOne("HTTP://HOST.ORG/CaseSensitive?Key=Value")
      === "http://host.org/CaseSensitive?Key=Value")
  }

  test("non-default ports survive; :80 only strips for http, :443 only for https") {
    assert(canonOne("https://h.com:8080/p") === "https://h.com:8080/p")
    assert(canonOne("https://h.com:80/p") === "https://h.com:80/p")
    assert(canonOne("http://h.com:80/p") === "http://h.com/p")
    assert(canonOne("http://h.com:443/p") === "http://h.com:443/p")
  }

  test("an all-tracking query disappears entirely, with its '?'") {
    assert(canonOne("https://h.com/p?utm_a=1&utm_b=2&fbclid=z")
      === "https://h.com/p")
    assert(canonOne("https://h.com/p/?gclid=g") === "https://h.com/p")
  }

  test("mid-query tracking params are excised keeping neighbor order") {
    assert(canonOne("https://h.com/p?a=1&utm_medium=m&b=2&gclid=g&c=3")
      === "https://h.com/p?a=1&b=2&c=3")
  }

  test("host root collapses to the bare authority") {
    assert(canonOne("https://WWW.h.com/") === "https://h.com")
    assert(canonOne("https://h.com/#top") === "https://h.com")
  }

  test("canonicalize is idempotent") {
    val messy = Seq(
      "HTTPS://WWW.A.CO.UK:443/X/?utm_source=s&q=1#f",
      "http://b.org:80/", "https://c.com/p?utm_a=1",
      // the r12-ADVICE non-idempotency case: trailing '//' must fall in
      // ONE pass, and '//?q' likewise
      "https://h.com/a//", "https://h.com/a//?q=1")
    for (u <- messy) { val once = canonOne(u); assert(canonOne(once) === once) }
    assert(canonOne("https://h.com/a//") === "https://h.com/a")
    assert(canonOne("https://h.com/a//?q=1") === "https://h.com/a?q=1")
  }

  test("tracking strip is anchored to a param boundary, not a substring") {
    // 'xutm_b' merely CONTAINS 'utm_b' — an unanchored pattern ate its
    // tail ('?a=1&xutm_b=2&c=3' lost part of xutm_b, r12 ADVICE)
    assert(canonOne("https://h.com/p?a=1&xutm_b=2&c=3")
      === "https://h.com/p?a=1&xutm_b=2&c=3")
    // consecutive tracking params fall as one run (a consumed separator
    // must not shield the next param from the boundary anchor)
    assert(canonOne("https://h.com/p?utm_a=1&utm_b=2&c=3")
      === "https://h.com/p?c=3")
    assert(canonOne("https://h.com/p?utm_a=1&b=2&utm_c=3&d=4")
      === "https://h.com/p?b=2&d=4")
  }

  test("registered domain: eTLD+1 under two-label suffixes, last-two otherwise") {
    assert(domainOne("https://a.b.example.com/p") === "example.com")
    assert(domainOne("https://deep.sub.site.co.uk/p") === "site.co.uk")
    assert(domainOne("https://www.shop.com.au/p") === "shop.com.au")
    // a bare two-label host that IS a suffix falls back to itself
    assert(domainOne("https://co.uk/p") === "co.uk")
  }

  test("two-phase capPerDomain equals the single-window cap on skewed data") {
    val s = spark; import s.implicits._
    // one mega-domain (1000 rows), a mid one (40), many singletons —
    // the web-crawl skew shape the two-phase form exists for
    val rows =
      (1L to 1000L).map(i => (i, "mega.com", (i * 37) % 500)) ++
      (1001L to 1040L).map(i => (i, "mid.org", (i * 11) % 300)) ++
      (1041L to 1090L).map(i => (i, s"one$i.net", i % 100))
    val df = rows.toDF("doc_id", "domain", "quality").repartition(13)
    val ord = Seq(col("quality").desc, col("doc_id"))
    val got = UrlOps.capPerDomain(df, col("domain"), ord, cap = 5, salts = 4)
      .select("doc_id").as[Long].collect().sorted
    val w = Window.partitionBy(col("domain")).orderBy(ord: _*)
    val want = df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5).select("doc_id").as[Long].collect().sorted
    assert(got === want)
    // the mega-domain really was capped
    assert(got.count(_ <= 1000L) === 5)
  }

  test("capPerDomain with cap larger than any group keeps everything") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a.com", 3L), (2L, "a.com", 1L), (3L, "b.com", 9L))
      .toDF("doc_id", "domain", "quality")
    val got = UrlOps.capPerDomain(df, col("domain"),
      Seq(col("quality").desc, col("doc_id")), cap = 10)
    assert(got.count() === 3)
  }
}
