package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.HeadMeta
import graft.html.HeadMeta.Meta

/** Pure (no-Spark) tests of the WAT head-metadata scanner (q98's
  * map-side kernel). The corpus-level value check is the q98 DuckDB
  * oracle (fields re-derived from the raw page bytes); these pin the
  * scanner generality the oracle's equivalence argument brackets out
  * (case-insensitivity, whitespace tolerance, tag-name boundaries).
  */
class HeadMetaSpec extends AnyFunSuite {

  test("a generator-shaped page scans all fields") {
    val m = HeadMeta.scan(
      """<!DOCTYPE html>
        |<html lang="fra">
        |<head>
        |<meta charset="utf-8">
        |<title>Système de données</title>
        |<style>body{margin:0}</style>
        |<script>var q = 1 < 2 && "</div>";</script>
        |</head><body><p>x</p></body></html>""".stripMargin)
    assert(m == Meta("Système de données", "fra", true, 1, 1, 1))
  }

  test("mirror-page shape: no lang, no meta, title present") {
    val m = HeadMeta.scan(
      "<!DOCTYPE html>\n<html>\n<head><title>mirror</title></head>\n<body></body>\n</html>")
    assert(m == Meta("mirror", "", true, 0, 0, 0))
  }

  test("doctype is case-insensitive and tolerates leading whitespace") {
    assert(HeadMeta.scan("  \n<!doctype HTML><html></html>").hasDoctype)
    assert(!HeadMeta.scan("<html></html>").hasDoctype)
  }

  test("title is whitespace-collapsed and trimmed; first pair wins") {
    val m = HeadMeta.scan(
      "<html><title>  a \n\t b  </title><title>second</title></html>")
    assert(m.title == "a b")
  }

  test("unclosed title yields empty, not the rest of the document") {
    assert(HeadMeta.scan("<html><title>oops<body>text</body>").title == "")
  }

  test("tag-name boundaries: <metadata> is not <meta>, <styles> not <style>") {
    val m = HeadMeta.scan(
      "<html><metadata>x</metadata><styles>y</styles><meta charset=\"u\"><style>z</style></html>")
    assert(m.nMeta == 1 && m.nStyle == 1)
  }

  test("self-closing and uppercase tag opens count") {
    val m = HeadMeta.scan("<html><META/><SCRIPT src=\"a\"></SCRIPT><meta ></html>")
    assert(m.nMeta == 2 && m.nScript == 1)
  }

  test("lang attribute comes from the html tag only, double-quoted form") {
    assert(HeadMeta.scan("<html lang=\"deu\"><div lang=\"eng\"></div></html>").langAttr == "deu")
    assert(HeadMeta.scan("<html data-x=\"1\"><p>no lang</p></html>").langAttr == "")
  }

  test("generated corpus rows agree with the oracle's regex semantics") {
    // html arm of the generator: title single + lowercase + element-free,
    // lang double-quoted on <html>, doctype literal at byte 0 — the
    // corpus facts the q98 oracle equivalence argument relies on
    var checked = 0
    var idx = 0L
    while (checked < 50) {
      val row = graft.gen.PageGen.genRow(42L, idx)
      if (row.kind == "html") {
        val doc = new String(row.page.html, java.nio.charset.StandardCharsets.UTF_8)
        val m = HeadMeta.scan(doc)
        assert(m.hasDoctype, s"row $idx missing doctype")
        val reTitle = "<title>([^<]*)</title>".r
        assert(reTitle.findFirstMatchIn(doc).map(_.group(1).trim
          .replaceAll("\\s+", " ")).getOrElse("") == m.title, s"row $idx title")
        val reLang = "<html[^>]* lang=\"([^\"]*)\"".r
        assert(reLang.findFirstMatchIn(doc).map(_.group(1)).getOrElse("") ==
          m.langAttr, s"row $idx lang")
        assert("<script[\\s>/]".r.findAllIn(doc).size == m.nScript, s"row $idx script")
        assert("<meta[\\s>/]".r.findAllIn(doc).size == m.nMeta, s"row $idx meta")
        checked += 1
      }
      idx += 1
    }
  }
}
