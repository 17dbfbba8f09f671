package graft.ext

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.scalatest.funsuite.AnyFunSuite

/** Resolution precedence and degradation rules of [[CharsetDetect]] \u2014
  * the map-side decoder behind `warc_charset_extract`. */
class CharsetDetectSpec extends AnyFunSuite {

  private def dec(bytes: Array[Byte], ctype: String = ""): String =
    CharsetDetect.decode(bytes, 0, bytes.length, ctype)

  private val latin = "caf\u00e9 \u00bd" // \u00e9 and \u00bd, latin-1-encodable

  test("BOM wins over a wrong Content-Type declaration") {
    val body = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      latin.getBytes("UTF-16LE")
    assert(dec(body, "text/html; charset=iso-8859-1") === latin)
  }

  test("UTF-16BE BOM with nothing declared") {
    val body = Array[Byte](0xfe.toByte, 0xff.toByte) ++
      latin.getBytes("UTF-16BE")
    assert(dec(body) === latin)
  }

  test("UTF-8 BOM is consumed, not emitted") {
    val body = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      latin.getBytes(UTF_8)
    assert(dec(body) === latin)
  }

  test("Content-Type charset param, quoted and bare") {
    val body = latin.getBytes(ISO_8859_1)
    assert(dec(body, "text/html; charset=iso-8859-1") === latin)
    assert(dec(body, "text/html; charset=\"ISO-8859-1\"") === latin)
  }

  test("Content-Type beats a conflicting <meta charset>") {
    val html = s"""<meta charset="utf-8"/><p>$latin</p>"""
    val body = html.getBytes(ISO_8859_1)
    assert(dec(body, "text/html; charset=iso-8859-1").contains(latin))
  }

  test("<meta charset> simple and http-equiv forms") {
    val simple = s"""<html><meta charset="iso-8859-1"/><p>$latin</p>"""
    assert(dec(simple.getBytes(ISO_8859_1), "text/html").contains(latin))
    val equiv = "<meta http-equiv=\"Content-Type\" " +
      s"content=\"text/html; charset=windows-1252\"/><p>$latin \u20ac</p>"
    assert(dec(equiv.getBytes(Charset.forName("windows-1252")), "text/html")
      .contains(latin + " \u20ac"))
  }

  test("undeclared valid UTF-8 decodes as UTF-8") {
    assert(dec(latin.getBytes(UTF_8)) === latin)
  }

  test("undeclared non-UTF-8 bytes fall back to latin-1, never throw") {
    val body = latin.getBytes(ISO_8859_1) // 0xE9/0xBD invalid as UTF-8
    assert(dec(body) === latin)
  }

  test("unknown declared charset falls through to the probe") {
    val body = latin.getBytes(UTF_8)
    assert(dec(body, "text/html; charset=x-no-such-cs") === latin)
  }

  test("undecodable bytes under a declared charset degrade to U+FFFD") {
    val body = "ok ".getBytes(UTF_8) ++ Array(0xff.toByte, 0xfe.toByte)
    val out = dec(body, "text/html; charset=utf-8")
    assert(out.startsWith("ok ") && out.contains('\ufffd'))
  }

  test("every fixture exemplar round-trips through its case charset") {
    val charsets = Seq("UTF-8", "UTF-16LE", "UTF-16BE", "ISO-8859-1",
      "GBK", "windows-1252", "ISO-8859-1")
    assert(charsets.length === Warc.CharsetNumCases)
    for ((ex, csName) <- Warc.CharsetExemplars.zip(charsets)) {
      val cs = Charset.forName(csName)
      assert(new String(ex.getBytes(cs), cs) === ex, s"lossy under $csName")
    }
  }
}
