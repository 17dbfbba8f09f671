package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** HTML→text extraction rules, including the malformed-HTML family a
  * real crawl serves constantly: the extractor must DEGRADE (truncate,
  * pass through literally), never throw and never leak tag soup. */
class HtmlExtractSpec extends AnyFunSuite {

  private def x(s: String): String = HtmlExtract.extract(s)

  test("block tags break lines; inline tags vanish without whitespace") {
    assert(x("<p>a</p><p>b</p>") === "a\nb")
    assert(x("a<b>mid</b>c") === "amidc")
    assert(x("one<br/>two<br>three") === "one\ntwo\nthree")
    assert(x("<div><span>in</span>line</div>") === "inline")
    assert(x("<ul><li>x</li><li>y</li></ul>") === "x\ny")
  }

  test("script/style/title/noscript content drops, including fake tags inside") {
    assert(x("""<script>var a = "<p>not text</p>"; if (1 < 2) {}</script>ok""") === "ok")
    assert(x("<style>p { color: red } /* <div>x</div> */</style>ok") === "ok")
    assert(x("<title>page title</title>body") === "body")
    assert(x("<SCRIPT>UPPER()</SCRIPT>ok") === "ok")
    // RAWTEXT end-tag rule: </titlex> does not close <title>
    assert(x("<title>a</titlex>b</title>ok") === "ok")
  }

  test("comments and declarations drop; unterminated comment drops to EOF") {
    assert(x("<!DOCTYPE html>a<!-- <p>noise</p> -->b") === "ab")
    assert(x("a<!-- never closed") === "a")
    assert(x("a<!decl>b") === "ab")
  }

  test("entities: named + numeric decode; unknown/invalid stay literal") {
    assert(x("amp=&amp; lt=&lt; gt=&gt;") === "amp=& lt=< gt=>")
    assert(x("q=&quot; a=&#39; A=&#65; B=&#x42;") === "q=\" a=' A=A B=B")
    assert(x("&nbsp;") === " ")
    assert(x("AT&T and &foo; and &#x110000; and &#; and & end")
      === "AT&T and &foo; and &#x110000; and &#; and & end")
    // surrogate-range codepoints are invalid scalars → literal
    assert(x("&#xD800;") === "&#xD800;")
  }

  test("whitespace collapses per line; NBSP is content, not whitespace") {
    assert(x("<p>  a   b\t c  </p>") === "a b c")
    assert(x("<p>a&nbsp;&nbsp;b</p>") === "a  b")
    assert(x("<p> </p><p>x</p>") === "x") // whitespace-only lines drop
  }

  test("attribute values may contain '>' and quotes of the other kind") {
    assert(x("""<a href="x?a>b">link</a>""") === "link")
    assert(x("""<div data-x='say "hi" > now'>t</div>""") === "t")
  }

  test("malformed input degrades: stray '<', unclosed tag, bogus close") {
    assert(x("1 < 2 and 3<4") === "1 < 2 and 3<4")
    assert(x("text <a href=") === "text")   // truncated tag: drop rest
    assert(x("a</ bogus>b") === "ab")       // HTML5 bogus comment to '>'
    assert(x("a<script>never closed") === "a")
    assert(x("") === "")
  }

  test("the fixture page extracts to exactly title+text+entity lines") {
    val text = "key agg row scan slow fast"
    val got = HtmlExtract.extract(Warc.synthesizeHtml(7L, text))
    assert(got === s"planted-title-7\n$text\n${Warc.HtmlEntityLineText}")
    // single-word text: the <b> wrap covers the whole body
    val one = HtmlExtract.extract(Warc.synthesizeHtml(8L, "solo"))
    assert(one === s"planted-title-8\nsolo\n${Warc.HtmlEntityLineText}")
  }

  test("escapeHtml round-trips through extraction for hostile text") {
    val hostile = "a & b < c > d"
    val got = HtmlExtract.extract(Warc.synthesizeHtml(9L, hostile))
    assert(got === s"planted-title-9\n$hostile\n${Warc.HtmlEntityLineText}")
  }
}
