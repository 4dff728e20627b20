package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import graft.html.CharsetSniff
import graft.html.CharsetSniff.{Sniff, sniff, decode, encodeVariant, variantSource}

/** Pure (no-Spark) tests of the charset sniffing ladder (q97's map-side
  * kernel): BOM detection, the meta prescan's quoting/terminator rules,
  * strict UTF-8 validation (the one arm q97's hex oracle can't witness,
  * since the generated corpus plants no invalid-UTF-8 html), and exact
  * decode roundtrips through every planted variant.
  */
class CharsetSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  // ---- BOMs -----------------------------------------------------------

  test("UTF-8 BOM wins over any declaration") {
    val body = ascii("""<html><head><meta charset="windows-1252"></head>""")
    val s = sniff(b(0xEF, 0xBB, 0xBF) ++ body)
    assert(s == Sniff("utf-8-bom", 3, null))
  }

  test("UTF-16 BOMs detect little- and big-endian") {
    assert(sniff(b(0xFF, 0xFE, 0x3C, 0x00)).charset == "utf-16le")
    assert(sniff(b(0xFE, 0xFF, 0x00, 0x3C)).charset == "utf-16be")
  }

  // ---- prescan --------------------------------------------------------

  test("double-quoted, single-quoted and bare declarations all parse") {
    assert(sniff(ascii("<meta charset=\"windows-1252\">")).decl == "windows-1252")
    assert(sniff(ascii("<meta charset='windows-1252'>")).decl == "windows-1252")
    assert(sniff(ascii("<meta charset=windows-1252>")).decl == "windows-1252")
  }

  test("http-equiv content form parses (bare value ends at the quote)") {
    val s = sniff(ascii(
      "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">"))
    assert(s == Sniff("windows-1252", 0, "windows-1252"))
  }

  test("prescan is ASCII-case-insensitive and tolerates = spacing") {
    assert(sniff(ascii("<META CHARSET = \"WINDOWS-1252\">")).charset == "windows-1252")
  }

  test("first declaration wins") {
    val s = sniff(ascii("<meta charset=\"windows-1252\"><meta charset=\"utf-8\">"))
    assert(s.charset == "windows-1252")
  }

  test("a declaration beyond the 1024-byte window is invisible") {
    val pad = "x" * CharsetSniff.PrescanWindow
    val s = sniff(ascii(s"<html>$pad<meta charset=windows-1252>"))
    assert(s.decl == null && s.charset == "utf-8")
  }

  test("an unknown label records the decl but falls through to validation") {
    val s = sniff(ascii("<meta charset=\"shift_jis\">hello"))
    assert(s == Sniff("utf-8", 0, "shift_jis"))
  }

  test("charset without =value keeps scanning instead of bailing") {
    assert(sniff(ascii("<p>charset rules</p><meta charset=utf-8>")).decl == "utf-8")
  }

  // ---- strict UTF-8 validation ---------------------------------------

  test("valid multi-byte UTF-8 passes validation") {
    assert(sniff("héllo — …©".getBytes(StandardCharsets.UTF_8)).charset == "utf-8")
  }

  test("invalid UTF-8 falls back to windows-1252") {
    assert(sniff(b('h', 0xE9, 'l')).charset == "windows-1252") // bare latin-1 é
    assert(sniff(b(0xC0, 0x80)).charset == "windows-1252") // overlong NUL
    assert(sniff(b(0xED, 0xA0, 0x80)).charset == "windows-1252") // surrogate
    assert(sniff(b(0xF5, 0x80, 0x80, 0x80)).charset == "windows-1252") // >U+10FFFF
    assert(sniff(b('a', 0xE2, 0x82)).charset == "windows-1252") // truncated
    assert(sniff(b(0x80)).charset == "windows-1252") // lone continuation
  }

  test("windows-1252 decode maps the 0x80-0x9F block, not C1 controls") {
    val s = sniff(b('a', 0x97, 'b', 0x85))
    assert(decode(b('a', 0x97, 'b', 0x85), s) == "a—b…") // — and …
  }

  // ---- variant synthesis + roundtrip ----------------------------------

  private val SampleHtml =
    ("<!DOCTYPE html>\n<html lang=\"fra\">\n<head>\n<meta charset=\"utf-8\">\n" +
      "<title>Système — données</title>\n</head>\n<body>\n" +
      "<p>être à la page… &copy; ©</p>\n</body>\n</html>\n")
      .getBytes(StandardCharsets.UTF_8)

  test("every variant sniffs to its planted charset and roundtrips exactly") {
    val expected = Map(0 -> "utf-8", 1 -> "utf-8-bom", 2 -> "utf-16le",
      3 -> "utf-16be", 4 -> "windows-1252", 5 -> "windows-1252")
    for (v <- 0 to 5) {
      val payload = encodeVariant(SampleHtml, v)
      val s = sniff(payload)
      assert(s.charset == expected(v), s"variant $v sniffed ${s.charset}")
      assert(decode(payload, s) == variantSource(SampleHtml, v),
        s"variant $v did not roundtrip")
    }
  }

  test("variants 4/5 splice their declaration directly after <head>") {
    val src = variantSource(SampleHtml, 4)
    assert(src.contains("<head>" + CharsetSniff.MetaV4))
    val src5 = variantSource(SampleHtml, 5)
    assert(src5.contains("<head>" + CharsetSniff.MetaV5))
  }

  test("headless html gets the declaration prepended (dup-page shape)") {
    val noHead = ascii("<html><body><p>mirror</p></body></html>")
    assert(variantSource(noHead, 4).startsWith(CharsetSniff.MetaV4))
    val payload = encodeVariant(noHead, 4)
    assert(sniff(payload).charset == "windows-1252")
  }

  test("an unmappable character encodes as ? on the 1252 arm (no throw)") {
    val euroless = "<head></head>中".getBytes(StandardCharsets.UTF_8) // CJK
    val payload = encodeVariant(euroless, 4)
    assert(decode(payload, sniff(payload)).endsWith("?"))
  }

  test("generated corpus pages roundtrip through all six variants") {
    // a real generator row (html arm): decode-with-detected must equal
    // the variant source byte-for-byte — the in-JVM mirror of q97's
    // roundtrip gate
    val page = graft.gen.PageGen.genRow(42L, 12L) // html for this seed
    assert(page.kind == "html")
    for (v <- 0 to 5) {
      val payload = encodeVariant(page.page.html, v)
      val s = sniff(payload)
      assert(decode(payload, s) == variantSource(page.page.html, v),
        s"variant $v did not roundtrip on a generated page")
    }
  }
}
