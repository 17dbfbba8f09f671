package graft.functions

import graft.SparkSpecBase

import org.apache.spark.sql.functions._

/** NFC expression: every rule family against java.text.Normalizer's
  * own reference output, identity/fast-path behavior, nulls, codegen
  * vs interpreted parity, and the SQL registration. */
class NfcSpec extends SparkSpecBase {
  import spark.implicits._

  private val cases = Seq(
    "e\u0301" -> "\u00e9",                       // compose
    "A\u030a" -> "\u00c5",                       // compose
    "\u212b" -> "\u00c5",                        // singleton
    "q\u0307\u0323" -> "q\u0323\u0307",          // canonical reorder
    "\u1e0b\u0323" -> "\u1e0d\u0307",            // decompose-recompose
    "\u1100\u1161\u11a8" -> "\uac01",            // Hangul jamo
    "ascii stays ascii" -> "ascii stays ascii",
    "" -> "")

  test("all NFC rule families normalize to the reference output") {
    val got = cases.map(_._1).toDF("t")
      .select(NfcExpressions.nfc(col("t"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("already-normalized input is returned unchanged (fast path)") {
    val composed = cases.map(_._2)
    val got = composed.toDF("t")
      .select(NfcExpressions.nfc(col("t"))).as[String].collect().toSeq
    assert(got === composed)
  }

  test("null propagates") {
    val got = Seq[Option[String]](None, Some("é")).toDF("t")
      .select(NfcExpressions.nfc(col("t"))).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) === "\u00e9")
  }

  test("interpreted eval matches codegen") {
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("q\u0307\u0323")))
    assert(e.eval(null).toString === "q\u0323\u0307")
  }


  test("strip accents: marks dropped across categories, base letters kept") {
    val cases = Seq(
      "cafe\u0301" -> "cafe",                 // Mn after NFD
      "\u00c5ngstr\u00f6m" -> "Angstrom",      // precomposed decompose+strip
      "\u0915\u093e" -> "\u0915",             // Mc (spacing mark) dropped
      "a\u20dd" -> "a",                       // Me (enclosing mark) dropped
      "stra\u00dfe" -> "stra\u00dfe",          // ß is a letter, kept
      "\u0142\u00f3d\u017a" -> "\u0142odz",    // ł kept (not a mark decomposition)
      "\u1100\u1161\u11a8" -> "\uac01",        // jamo recomposed by the final NFC
      "plain" -> "plain")
    val got = cases.map(_._1).toDF("t")
      .select(NfcExpressions.stripAccents(col("t"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("strip accents: ascii fast path returns the input, null propagates") {
    val e = StripAccents(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("ascii only")))
    assert(e.eval(null).toString === "ascii only")
    val got = Seq[Option[String]](None).toDF("t")
      .select(NfcExpressions.stripAccents(col("t"))).collect()
    assert(got(0).isNullAt(0))
  }
}
