package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp.EntityMatcher

/** Entity-matcher semantics: one case per ported rule family plus the
  * engine rules (priority, overlap suppression, context confidence,
  * normalizers) — mirroring the families at
  * /root/reference/ocrworker/nlp/patterns.py:53-206. */
class EntitySpec extends AnyFunSuite {

  private def ents(t: String) = EntityMatcher.matchEntities(t)
  private def one(t: String, label: String) = {
    val m = ents(t).filter(_.label == label)
    assert(m.length == 1, s"expected 1 $label in '$t', got ${m.mkString(";")}")
    m.head
  }

  test("invoice / po / order / account / reference numbers") {
    assert(one("Invoice INV-4839201 enclosed", "INVOICE_NUMBER").normalized == "4839201")
    assert(one("see PO 123456 for details", "PO_NUMBER").normalized == "123456")
    assert(one("your ORDER #987654", "ORDER_NUMBER").normalized == "987654")
    assert(one("debit ACCT-55501234", "ACCOUNT_NUMBER").normalized == "55501234")
    assert(one("quote REF-ABC123 when calling", "REFERENCE_NUMBER").normalized == "ABC123")
  }

  test("money: USD, EU separator swap, GBP") {
    assert(one("total $1,234.56 due", "MONEY").normalized == "1234.56")
    assert(one("Betrag 1.234,56 EUR offen", "MONEY").normalized == "1234.56")
    assert(one("fee £99.95 applies", "MONEY").normalized == "99.95")
    assert(one("sum 12.345,00 EUR", "MONEY").normalized == "12345.00")
  }

  test("dates: ISO, MDY, DMY fallback, written month, 2-digit pivot") {
    assert(one("dated 2024-03-15 here", "DATE").normalized == "2024-03-15")
    assert(one("on 03/15/2024 we met", "DATE").normalized == "2024-03-15")
    // 15/03/2024: MDY impossible (month 15) → DMY fallback
    assert(one("on 15/03/2024 we met", "DATE").normalized == "2024-03-15")
    assert(one("signed March 5, 2021 by", "DATE").normalized == "2021-03-05")
    // pivot: 49 → 2049, 50 → 1950 (patterns.py:289-305 semantics)
    assert(one("on 01/02/49 x", "DATE").normalized == "2049-01-02")
    assert(one("on 01/02/50 x", "DATE").normalized == "1950-01-02")
  }

  test("tax ids: SSN, EIN, VAT") {
    assert(one("SSN 123-45-6789 on file", "TAX_ID").normalized == "123-45-6789")
    assert(one("EIN 12-3456789 registered", "TAX_ID").normalized == "12-3456789")
    assert(one("VAT DE123456789 charged", "TAX_ID").normalized == "DE123456789")
  }

  test("email, url, phone, percentage") {
    assert(one("mail Bob.Smith@Example.COM now", "EMAIL").normalized == "bob.smith@example.com")
    assert(one("visit https://ex.org/a?b=1 soon", "URL").text == "https://ex.org/a?b=1")
    assert(one("call 555-867-5309 today", "PHONE").normalized == "5558675309")
    assert(one("a 7.5 % rate applies", "PERCENTAGE").normalized == "7.5")
  }

  test("overlap suppression: higher-priority rule wins the span") {
    // INV-48392015 could also parse as bare digits by lower rules;
    // only the invoice rule may claim the region
    val es = ents("Invoice INV-48392015 total $10.00")
    assert(es.count(_.label == "INVOICE_NUMBER") == 1)
    val inv = es.filter(_.label == "INVOICE_NUMBER").head
    es.filter(_ != inv).foreach { e =>
      assert(e.end <= inv.start || e.start >= inv.end, s"overlap: $e vs $inv")
    }
  }

  test("context confidence: cue word present → 1.0, absent → 0.7") {
    assert(one("total amount $5.00 now", "MONEY").confidence == 1.0)
    assert(one("xyz $5.00 qqq", "MONEY").confidence == 0.7)
  }

  test("first-match-wins field assignment") {
    val fields = EntityMatcher.assignFields(
      ents("Invoice INV-1111111 then INVOICE 2222222 total $3.00"))
    assert(fields("invoice_number") == "1111111")
    assert(fields("money") == "3.00")
  }

  test("determinism and totality") {
    assert(ents("").isEmpty && ents(null).isEmpty)
    val t = "Invoice INV-4839201 dated 2024-03-15 total $1,234.56 billing@x.org 555-123-4567 7% rate"
    assert(ents(t).toSeq == ents(t).toSeq)
    val labels = ents(t).map(_.label).toSet
    assert(Set("INVOICE_NUMBER", "DATE", "MONEY", "EMAIL", "PHONE", "PERCENTAGE").subsetOf(labels))
  }

  test("end-to-end: entities extracted from generated html pages") {
    var withEnts = 0
    var pages = 0
    (0 until 300).foreach { i =>
      val g = graft.gen.PageGen.genRow(graft.gen.PageGen.DefaultSeed, i.toLong)
      if (g.kind == "html") {
        pages += 1
        val extracted = graft.core.Extract(g.page).extracted_text
        val es = EntityMatcher.matchEntities(extracted)
        if (es.nonEmpty) withEnts += 1
        // entities found in the extracted text must equal those found in
        // the generator's intended text (extraction preserves offsets'
        // content — byte identity makes the texts equal)
        assert(es.toSeq == EntityMatcher.matchEntities(g.intended).toSeq)
      }
    }
    assert(withEnts > pages / 3, s"only $withEnts/$pages pages had entities")
  }
}
