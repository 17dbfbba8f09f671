package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII masking — the Dolma (Soldaini et al. 2024) / CCNet-lineage
  * redaction pass every public LLM corpus ships through before
  * training: regex-detect emails, IPv4 addresses, and NANP phone
  * numbers and replace each with a stable placeholder token (Dolma's
  * literal `|||EMAIL_ADDRESS|||` / `|||IP_ADDRESS|||` /
  * `|||PHONE_NUMBER|||` strings, so downstream tokenizers see the same
  * sentinel the public corpora contain). Extension beyond the reference
  * (SURVEY.md §2.8 north star).
  *
  * Scale design (the 100 TB contract): redaction is a pure per-row
  * projection — three codegen'd `regexp_replace`/`regexp_extract_all`
  * expressions inside whole-stage codegen, no shuffle, no UDF, no
  * state. It composes into any scan at zero structural cost; the only
  * knob that matters at scale is running it EARLY (before text is
  * shuffled anywhere) so no PII byte ever crosses the wire — which is
  * how [[redactDocs]] is written.
  *
  * The regexes deliberately use only syntax with identical semantics in
  * Java's engine and RE2 (character classes, bounded repetition, `\b`)
  * so the DuckDB oracle can restate them verbatim. Count columns are
  * per-pattern match counts on the ORIGINAL text; patterns are disjoint
  * by construction (a phone/IP cannot occur inside a masked email —
  * masking order is email → IP → phone and the placeholders contain no
  * digits), so counts are order-independent.
  */
object PiiRedact {

  /** RFC-5322-lite, the form Dolma and CCNet both use: local part of
    * word chars + `._%+-`, domain labels, >= 2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings ("1.2.3.4567")
    * do not half-match. Octet range is NOT validated (neither does
    * Dolma's) — redaction over-matching beats under-matching. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP phone shapes: optional parens around the area code, the three
    * groups separated by `-`, `.`, or a space (the Dolma pattern). A
    * separator is REQUIRED so plain 10-digit integers in data tables
    * are not eaten. */
  val PhoneRe = "\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}"

  val EmailToken = "|||EMAIL_ADDRESS|||"
  val IpToken    = "|||IP_ADDRESS|||"
  val PhoneToken = "|||PHONE_NUMBER|||"

  /** All three masks, email → IP → phone. Idempotent: placeholders
    * contain no `@` and no digits, so a second pass matches nothing. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        Ipv4Re, IpToken),
      PhoneRe, PhoneToken)

  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** (id, text, n_emails, n_ips, n_phones): the redacted corpus plus
    * per-document detection counts — the per-row audit trail a curation
    * run keeps. One map-side projection; see the scaladoc contract. */
  def redactDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      redact(t).as(textCol),
      countMatches(t, EmailRe).as("n_emails"),
      countMatches(t, Ipv4Re).as("n_ips"),
      countMatches(t, PhoneRe).as("n_phones"))
  }

  /** One-row corpus audit: documents touched and total matches per
    * class (read before committing a corpus-wide rewrite). */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    redactDocs(docs, idCol, textCol).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0, 1L)
        .otherwise(0L)).as("docs_with_pii"),
      sum("n_emails").as("n_emails"),
      sum("n_ips").as("n_ips"),
      sum("n_phones").as("n_phones"))
}
