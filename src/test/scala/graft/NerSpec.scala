package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp.Ner
import graft.gen.PageGen

/** Rule-based NER + contextual party assignment (F8). */
class NerSpec extends AnyFunSuite {

  test("org detection by corporate suffix, leading connector stripped") {
    val m = Ner.extract("Payment from Data Systems LLC arrived early.")
    assert(m.organizations.toSeq == Seq("Data Systems LLC"))
  }

  test("person detection by first-name bigram and honorific") {
    val m1 = Ner.extract("Please ask Maria Garcia about the refund.")
    assert(m1.persons.toSeq == Seq("Maria Garcia"))
    val m2 = Ner.extract("A note was left by Dr Okafor yesterday.")
    assert(m2.persons.toSeq == Seq("Okafor"))
  }

  test("location gazetteer, one and two tokens") {
    val m = Ner.extract("We moved stock from Berlin to New York quickly.")
    assert(m.locations.toSeq == Seq("Berlin", "New York"))
  }

  test("vendor/client assignment from before-window cues") {
    val m = Ner.extract(
      "From Acme Widgets Inc billed to Globex Trading LLC for parts.")
    assert(m.vendor == "Acme Widgets Inc")
    assert(m.client == "Globex Trading LLC")
  }

  test("signatory and contact assignment, signatory excluded from contact") {
    val m = Ner.extract(
      "Signed by John Smith on behalf of the buyer. Contact Lena Novak for questions.")
    assert(m.signatory == "John Smith")
    assert(m.contact == "Lena Novak")
  }

  test("no false positives on plain sentence-initial capitals") {
    val m = Ner.extract("The system was slow. Data was lost. Value dropped.")
    assert(m.persons.isEmpty && m.organizations.isEmpty && m.locations.isEmpty)
  }

  test("dedup keeps first-occurrence order") {
    // NB first mention at char 0 is never assigned (reference requires
    // idx > 0, extractor.py:339); start with a filler word
    val m = Ner.extract(
      "Today Wei Chen met Pavel Novak. Later Wei Chen signed. Signature: Wei Chen")
    assert(m.persons.toSeq == Seq("Wei Chen", "Pavel Novak"))
    assert(m.signatory == "Wei Chen")
  }

  test("candidate order invariant the q40 oracle relies on") {
    // NerOracle reconstructs LinkedHashSet first-occurrence order as
    // ORDER BY min(start). Sound iff candidates() emits ascending,
    // DISTINCT starts (so dedup order == min-start order with no ties).
    // Check over the generator corpus, not just handcrafted strings.
    var i = 0L
    var checked = 0
    while (i < 400) {
      val g = PageGen.genRow(PageGen.DefaultSeed, i)
      if (g.kind == "html" && g.dupOf < 0) {
        val t = graft.core.Extract(g.page).extracted_text
        val starts = Ner.candidates(t).map(_.start)
        assert(starts.sameElements(starts.sorted), s"row $i not ascending")
        assert(starts.distinct.length == starts.length, s"row $i start tie")
        checked += 1
      }
      i += 1
    }
    assert(checked > 100)
  }

  test("end-to-end: planted generator sentences are recovered") {
    // find generated pages containing each nerSentence shape and check
    // extraction -> NER recovers the planted parties
    var vendors = 0; var signers = 0; var locs = 0
    var i = 0L
    while (i < 600) {
      val g = PageGen.genRow(PageGen.DefaultSeed, i)
      if (g.kind == "html" && g.dupOf < 0) {
        val m = Ner.extract(graft.core.Extract(g.page).extracted_text)
        if (m.vendor != null) vendors += 1
        if (m.signatory != null) signers += 1
        if (m.locations.nonEmpty) locs += 1
      }
      i += 1
    }
    assert(vendors > 20, s"vendors=$vendors")
    assert(signers > 20, s"signers=$signers")
    assert(locs > 40, s"locs=$locs")
  }
}
