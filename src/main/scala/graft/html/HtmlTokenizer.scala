package graft.html

/** Event sink for the streaming tokenizer. */
trait HtmlHandler {
  def startTag(name: String, selfClosing: Boolean): Unit
  def endTag(name: String): Unit
  /** Text with entities already decoded; raw whitespace preserved.
    * The CharSequence is the tokenizer's REUSED buffer — consume it
    * before returning, never retain a reference. */
  def text(s: CharSequence): Unit
  /** href of an `<a>` start tag — fired BEFORE the corresponding
    * startTag("a"), only for ABSOLUTE http/https values (the out-link
    * surface, Common-Crawl-WAT-style; relative links are navigation
    * noise and are never materialized). Value is the raw attribute
    * text (no entity decode). First href attribute wins. Recognized
    * when the attribute name is whitespace-preceded (the forgiving
    *-tokenizer contract both tokenizers pin byte-identically). */
  def anchorHref(href: String): Unit = ()
}

/** A single-pass, forgiving, allocation-light streaming HTML tokenizer.
  *
  * Hand-rolled from scratch (no HTML library exists in this sandbox, and
  * the north rule asks for a streaming tokenizer anyway). It plays the
  * role the OCR engines' low-level text emitters play in the reference
  * (e.g. the tesseract TSV walk at
  * /root/reference/ocrworker/engines/tesseract.py:36-71): turn an opaque
  * payload into an ordered stream of text fragments with structure.
  *
  * Handles: comments, doctype, processing instructions, CDATA, raw-text
  * elements (script/style — content skipped; textarea is deliberately
  * NOT raw-text here: its markup parses as tags, matching
  * ByteHtmlTokenizer so the byte-identity contract holds),
  * quoted attributes containing '>', self-closing tags, character
  * entities (named core set + numeric dec/hex), unclosed/stray tags
  * (forgiving: emitted as-is, never throws).
  */
object HtmlTokenizer {

  private val rawTextTags = Set("script", "style")

  def tokenize(s: String, h: HtmlHandler): Unit = {
    val n = s.length
    var i = 0
    val textBuf = new java.lang.StringBuilder(256)

    def flushText(): Unit = {
      if (textBuf.length() > 0) { h.text(textBuf); textBuf.setLength(0) }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (s.startsWith("<!--", i)) {
            val e = s.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val e = s.indexOf("]]>", i + 9)
            val end = if (e < 0) n else e
            textBuf.append(s, i + 9, end)
            i = if (e < 0) n else e + 3
          } else { // doctype or bogus declaration
            val e = s.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') {
          flushText()
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/' || isNameStart(c1)) {
          flushText()
          i = parseTag(s, i, h)
        } else {
          // '<' not starting a tag — literal text (forgiving)
          textBuf.append(c); i += 1
        }
      } else if (c == '&') {
        i = Entities.decodeInto(s, i, textBuf)
      } else {
        textBuf.append(c); i += 1
      }
    }
    flushText()
  }

  @inline private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

  /** Parse one tag starting at s(start)=='<'. Returns index after the tag.
    * For raw-text elements, also consumes content up to the matching
    * close tag (case-insensitive) and drops it.
    */
  private def parseTag(s: String, start: Int, h: HtmlHandler): Int = {
    val n = s.length
    var i = start + 1
    val closing = i < n && s.charAt(i) == '/'
    if (closing) i += 1
    val nameStart = i
    while (i < n && isNameChar(s.charAt(i))) i += 1
    if (i == nameStart) { // "</>" or "< " — forgiving skip to '>'
      val e = s.indexOf('>', i)
      return if (e < 0) n else e + 1
    }
    // known tags resolve to the canonical interned String (no alloc);
    // tag-name chars are ASCII (isNameChar), so per-char lowering equals
    // the old toLowerCase(Locale.ROOT)
    val name = {
      val interned = TagCatalog.lookupChars(s, nameStart, i)
      if (interned != null) interned
      else s.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
    }
    // scan attributes honoring quotes (values may contain '>')
    var selfClosing = false
    var done = false
    // <a> tags additionally watch for a whitespace-preceded href
    // attribute (the out-link surface); all other attribute machinery
    // (and all other tags) keep the plain quote-skipping scan. Position
    // semantics are identical either way — the href branch consumes
    // exactly the chars the generic branches would.
    val wantHref = !closing && name == "a"
    var hrefSeen = false
    while (i < n && !done) {
      val c = s.charAt(i)
      if (c == '>') { done = true; i += 1 }
      else if (wantHref && !hrefSeen && (c == 'h' || c == 'H') &&
               asciiWs(s.charAt(i - 1)) &&
               s.regionMatches(true, i, "href", 0, 4)) {
        var j = i + 4
        while (j < n && asciiWs(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == '=') {
          j += 1
          while (j < n && asciiWs(s.charAt(j))) j += 1
          if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val e = s.indexOf(q, j + 1)
            val end = if (e < 0) n else e
            hrefSeen = true
            if (isAbsoluteHttp(s, j + 1, end))
              h.anchorHref(s.substring(j + 1, end))
            i = if (e < 0) n else e + 1
          } else {
            val vs = j
            while (j < n && !asciiWs(s.charAt(j)) && s.charAt(j) != '>' &&
                   !(s.charAt(j) == '/' && j + 1 < n && s.charAt(j + 1) == '>')) j += 1
            hrefSeen = true
            if (isAbsoluteHttp(s, vs, j)) h.anchorHref(s.substring(vs, j))
            i = j
          }
        } else i += 4 // bare `href` boolean attr — skip the name
      }
      else if (c == '"' || c == '\'') {
        val e = s.indexOf(c, i + 1)
        i = if (e < 0) n else e + 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '>') {
        selfClosing = true; i += 2; done = true
      } else i += 1
    }
    if (closing) h.endTag(name)
    else {
      h.startTag(name, selfClosing)
      if (!selfClosing && rawTextTags.contains(name)) {
        // consume raw content until matching </name (case-insensitive)
        val close = "</" + name
        var j = i
        var found = -1
        while (found < 0 && j < n) {
          val k = indexOfIgnoreCase(s, close, j)
          if (k < 0) { found = n }
          else {
            val after = k + close.length
            val ok = after >= n || s.charAt(after) == '>' || Character.isWhitespace(s.charAt(after))
            if (ok) found = k else j = k + 1
          }
        }
        if (found < 0) found = n // raw content starts at end-of-input
        if (found >= n) { h.endTag(name); return n }
        val e = s.indexOf('>', found)
        h.endTag(name)
        return if (e < 0) n else e + 1
      }
    }
    i
  }

  /** Exactly ByteHtmlTokenizer.isWs lifted to chars — the href branch
    * must make identical decisions in both tokenizers, so it never uses
    * Character.isWhitespace (which also matches U+2028 etc. that the
    * byte scan cannot see as single bytes). */
  @inline private def asciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == 0x0b || (c >= 0x1c && c <= 0x1f)

  /** `http://` or `https://` prefix, ASCII-case-insensitive — checked
    * BEFORE materializing the value String, so the (overwhelmingly
    * common) relative hrefs cost zero allocation. */
  private[html] def isAbsoluteHttp(s: CharSequence, start: Int, end: Int): Boolean = {
    var i = start
    if (end - i < 7) return false
    @inline def lc(c: Char): Char = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    if (lc(s.charAt(i)) != 'h' || lc(s.charAt(i + 1)) != 't' ||
        lc(s.charAt(i + 2)) != 't' || lc(s.charAt(i + 3)) != 'p') return false
    i += 4
    if (i < end && lc(s.charAt(i)) == 's') i += 1
    i + 3 <= end && s.charAt(i) == ':' && s.charAt(i + 1) == '/' && s.charAt(i + 2) == '/'
  }

  private def indexOfIgnoreCase(s: String, sub: String, from: Int): Int = {
    val n = s.length; val m = sub.length
    var i = from
    while (i + m <= n) {
      if (s.regionMatches(true, i, sub, 0, m)) return i
      i += 1
    }
    -1
  }
}

/** HTML character-entity decoding: core named set + numeric dec/hex.
  * Unknown entities pass through literally (forgiving).
  */
object Entities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "rsquo" -> "’", "lsquo" -> "‘",
    "ldquo" -> "“", "rdquo" -> "”", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "euro" -> "€",
    "pound" -> "£", "cent" -> "¢", "sect" -> "§",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "deg" -> "°", "shy" -> ""
  )

  /** Decode an entity body (between '&' and ';'): the replacement
    * string, "" for a parsed-but-invalid numeric reference (consumed,
    * nothing emitted), or null for an unrecognized entity (caller
    * emits a literal '&' and advances one char). */
  def decodeBody(body: String): String = {
    if (body.startsWith("#")) {
      val num = body.substring(1)
      try {
        val cp =
          if (num.startsWith("x") || num.startsWith("X")) Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num)
        if (cp > 0 && Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else ""
      } catch { case _: NumberFormatException => null }
    } else named.getOrElse(body, null)
  }

  /** Decode the entity at s(i)=='&' appending to out; returns next index. */
  def decodeInto(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    // find ';' within a bounded window
    var j = i + 1
    val limit = math.min(n, i + 12)
    var semi = -1
    while (j < limit && semi < 0) {
      val c = s.charAt(j)
      if (c == ';') semi = j
      else if (c == '&' || Character.isWhitespace(c)) j = limit // abort
      else j += 1
    }
    if (semi < 0) { out.append('&'); return i + 1 }
    decodeBody(s.substring(i + 1, semi)) match {
      case null => out.append('&'); i + 1
      case rep  => out.append(rep); semi + 1
    }
  }
}
