package graft.ext

/** HTML → text extraction — the step between a raw `.warc.gz` HTTP
  * capture and a text corpus (the role CCNet/trafilatura/resiliparse
  * play in every public web-pipeline: Common Crawl's WET files are
  * exactly this transform applied to the WARC `response` records).
  * Complements [[Warc]]: WET parsing covers corpora that ship
  * pre-extracted; this covers the 100 TB crawls that don't.
  *
  * The algorithm is the standard public recipe (strip script/style,
  * drop tags, decode entities, block-level newline rules — the
  * html2text/BeautifulSoup `get_text` family), implemented as a SINGLE
  * forward scan with no regex backtracking and no dependencies:
  *
  *  1. `<script> <style> <title> <noscript> <template>` drop their
  *     entire content (case-insensitive, to the matching close tag;
  *     unterminated → to EOF — a truncated capture yields truncated
  *     text, never tag soup);
  *  2. comments `<!-- -->` and declarations/doctypes `<! >` drop;
  *  3. BLOCK-level tags (`p div h1..h6 li br tr …`, open or close)
  *     emit a line break; inline tags (`b i a span …`) vanish without
  *     inserting whitespace; attribute values may contain `>` inside
  *     quotes;
  *  4. entities decode: the named core (`&amp; &lt; &gt; &quot;
  *     &apos; &nbsp;`) plus numeric `&#NNN;`/`&#xHHH;`; anything
  *     unknown, invalid, or unterminated stays LITERAL (lenient — real
  *     crawl text is full of bare `&`);
  *  5. whitespace collapses per line (runs of ASCII whitespace → one
  *     space, trimmed; NBSP is content, not whitespace), empty lines
  *     drop, lines join with `\n`.
  *
  * A stray `<` not opening a tag/comment/declaration is literal text
  * (step 3 only fires on `</` or `<letter`), and an unclosed tag at
  * EOF drops silently — malformed HTML degrades, it never throws.
  *
  * Scale shape: pure per-row map-side string work (one `StringBuilder`
  * pass over the document, one over the segments), called from
  * [[Warc.htmlDocs]]'s `mapPartitions` — the blob/file-level
  * parallelism discipline of `Warc.parseRecords` is unchanged and
  * nothing here shuffles.
  */
object HtmlExtract {

  /** Content of these elements is dropped wholesale (HTML5 raw-text /
    * metadata elements — their "text" is code or metadata). */
  private val RawDrop = Set("script", "style", "title", "noscript", "template")

  /** Tags whose boundary ends the current text line (HTML block-level
    * display set plus the void separators `br`/`hr`). */
  private val Block = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "hr", "table", "thead", "tbody", "tfoot", "tr", "td", "th",
    "blockquote", "pre", "section", "article", "header", "footer",
    "nav", "aside", "main", "figure", "figcaption", "form", "fieldset",
    "dl", "dt", "dd", "address", "center", "head", "body", "html")

  private val Named = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> '\u00A0')

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  /** Decode the entity starting at `pos` (which points at '&').
    * Returns (decoded string, next position); a non-entity yields the
    * literal '&' and pos+1. Bounded lookahead (longest valid form is
    * `&#x10FFFF;` — 10 chars of payload). */
  private def entity(s: String, pos: Int): (String, Int) = {
    val semi = s.indexOf(';', pos + 1)
    if (semi < 0 || semi - pos > 11) ("&", pos + 1)
    else {
      val body = s.substring(pos + 1, semi)
      if (body.startsWith("#")) {
        val num = body.substring(1)
        val cp =
          try {
            if (num.length > 1 && (num(0) == 'x' || num(0) == 'X'))
              Integer.parseInt(num.substring(1), 16)
            else if (num.nonEmpty && num.forall(_.isDigit))
              Integer.parseInt(num)
            else -1
          } catch { case _: NumberFormatException => -1 }
        if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
          (new String(Character.toChars(cp)), semi + 1)
        else ("&", pos + 1)
      } else Named.get(body) match {
        case Some(c) => (c.toString, semi + 1)
        case None    => ("&", pos + 1)
      }
    }
  }

  /** Lowercased tag name starting at `pos` (first char after '<' or
    * '</'); empty if none. */
  private def tagName(s: String, pos: Int): String = {
    var i = pos
    while (i < s.length && (s(i).isLetter || s(i).isDigit)) i += 1
    s.substring(pos, i).toLowerCase
  }

  /** Index just past the '>' closing the tag whose name ends at `from`,
    * honoring quoted attribute values (`href="a>b"`); -1 when the tag
    * never closes (truncated capture → caller drops the rest). */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    -1
  }

  /** Case-insensitive `indexOf` for the `</name` close-tag scan. The
    * name must end at a tag-name boundary (`</titlex>` does not close
    * `<title>`, per the HTML5 RAWTEXT end-tag rule). */
  private def closeTagIndex(s: String, name: String, from: Int): Int = {
    val pat = "</" + name
    var i = from
    val limit = s.length - pat.length
    while (i <= limit) {
      var j = 0
      while (j < pat.length && Character.toLowerCase(s(i + j)) == pat(j)) j += 1
      if (j == pat.length &&
          (i + j >= s.length || !(s(i + j).isLetter || s(i + j).isDigit)))
        return i
      i += 1
    }
    -1
  }

  /** The extracted text: block-separated lines, entities decoded,
    * whitespace collapsed (see object doc). Total one pass + one
    * segment pass; never throws on malformed input. */
  def extract(html: String): String = {
    val out = new StringBuilder(html.length / 2)
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html(i)
      if (c == '&') {
        val (dec, next) = entity(html, i)
        out.append(dec); i = next
      } else if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && html(i + 1) == '!') {
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && (html(i + 1).isLetter || html(i + 1) == '/')) {
          val close = html(i + 1) == '/'
          val nameAt = if (close) i + 2 else i + 1
          val name = tagName(html, nameAt)
          val end = tagEnd(html, nameAt + name.length)
          if (name.isEmpty) {
            // "</" + non-letter: HTML5 "bogus comment", consumed to '>'
            val e = html.indexOf('>', nameAt)
            i = if (e < 0) n else e + 1
          } else if (end < 0) i = n // truncated capture: drop the rest
          else {
            val selfClosing = end >= 2 && html(end - 2) == '/'
            if (Block(name)) out.append('\n')
            if (!close && !selfClosing && RawDrop(name)) {
              val at = closeTagIndex(html, name, end)
              i = if (at < 0) n
              else { val e = tagEnd(html, at + 2 + name.length); if (e < 0) n else e }
            } else i = end
          }
        } else { out.append('<'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    // per-line whitespace collapse without regex: one pass
    val lines = Vector.newBuilder[String]
    val line = new StringBuilder
    var pendingSpace = false
    def flush(): Unit = {
      if (line.nonEmpty) lines += line.toString
      line.clear(); pendingSpace = false
    }
    var k = 0
    while (k < out.length) {
      val c = out(k)
      if (c == '\n') flush()
      else if (isAsciiWs(c)) { if (line.nonEmpty) pendingSpace = true }
      else { if (pendingSpace) line.append(' '); pendingSpace = false; line.append(c) }
      k += 1
    }
    flush()
    lines.result().mkString("\n")
  }
}
