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

  test("BOM-less UTF-16LE declaring itself only in <meta> is prescanned") {
    // the r14 disclosed gap: no BOM, no Content-Type, declaration only
    // readable after NUL-stripping the UTF-16 prelude
    val body = ("<html><head><meta charset=\"utf-16\"></head>" +
      "<body>" + latin + "</body></html>").getBytes("UTF-16LE")
    assert(dec(body).contains(latin))
  }

  test("BOM-less UTF-16BE with an http-equiv meta is prescanned too") {
    val body = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=utf-16\"></head><body>" + latin +
      "</body></html>").getBytes("UTF-16BE")
    assert(dec(body).contains(latin))
  }

  test("the detected byte pattern decides endianness, not the declared name") {
    // a UTF-16LE page whose meta (wrongly) names a non-UTF-16 charset:
    // the NUL-interleaved pattern is what's real about the bytes
    val body = ("<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>" + latin + "</body></html>").getBytes("UTF-16LE")
    assert(dec(body).contains(latin))
  }

  test("meta-declared utf-16 on an ASCII-readable page maps to UTF-8 (WHATWG)") {
    // if the declaration is readable through a latin-1 scan the page
    // cannot be UTF-16; honoring the name would mojibake the body
    val body = ("<html><head><meta charset=\"utf-16\"></head><body>" +
      latin + "</body></html>").getBytes(UTF_8)
    assert(dec(body).contains(latin))
  }

  test("NUL-heavy bytes WITHOUT a meta declaration do not trigger the prescan") {
    // binary payload look-alike: '<' + NULs but no charset declaration
    val body = "<x>".getBytes("UTF-16LE") ++ new Array[Byte](64)
    val out = dec(body)
    assert(out != null) // falls through to probe/latin-1, never throws
    assert(CharsetDetect.sniffUtf16Meta(body, 0, body.length).isEmpty)
  }

  test("UTF-32 and NUL-padded binary containing meta ASCII fail the prescan") {
    // UTF-32: ~75% NULs and a meta declaration readable after
    // NUL-stripping, but its three NULs per ASCII char split 2:1
    // across parities — the >=90% parity-dominance gate rejects both
    // endiannesses (the '<'-adjacency gate alone could not: UTF-32BE's
    // 00 00 00 3C happens to satisfy the BE neighbor pattern)
    for (cs <- Seq("UTF-32BE", "UTF-32LE")) {
      val u32 = ("<html><head><meta charset=\"utf-16\"></head><body>hi</body>")
        .getBytes(cs)
      assert(CharsetDetect.sniffUtf16Meta(u32, 0, u32.length).isEmpty,
        s"$cs must not prescan as UTF-16")
    }
    // NUL-padded binary: the pad's NULs split ~50:50 across parities,
    // and the trailing plain-ASCII meta is not code-unit aligned
    val pad = new Array[Byte](700) ++
      "<meta charset=\"utf-16\">".getBytes("ISO-8859-1")
    assert(CharsetDetect.sniffUtf16Meta(pad, 0, pad.length).isEmpty,
      "NUL-padded binary with meta-like ASCII must not prescan")
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
