package graft.nlp

import scala.collection.mutable.ArrayBuffer

/** Rule-based NER + contextual party assignment — the re-expression of
  * the reference's spaCy NER pass and cue-word field assignment
  * (/root/reference/ocrworker/nlp/extractor.py:142-170 categorizes
  * PERSON/ORG/GPE-LOC entities into ExtractedMetadata lists at :25-100;
  * :329-381 assigns vendor/client from orgs and signatory/contact from
  * persons by scanning a lowercase context window for cue words).
  *
  * No model ships in this sandbox, so detection is deterministic rules
  * over capitalized-token sequences:
  *   - ORG: sequence ending in a corporate suffix (Inc/LLC/GmbH/...);
  *   - PERSON: honorific-prefixed sequence, or a (known first name,
  *     Capitalized) bigram inside the sequence;
  *   - LOC: gazetteer of city/country names (single or two-token).
  * Leading connector capitals (From/Dear/Contact/...) are stripped so
  * sentence position never leaks into the entity text. De-duplication
  * keeps first occurrence order, as the reference's list appends do.
  *
  * The assignment pass mirrors extractor.py:329-381 faithfully,
  * including its substring cue semantics and window sizes (50 chars
  * before for vendor/client over the first orgs; +-100 for signatory;
  * +-50 for contact) and the vendor != client / signatory != contact
  * exclusions.
  */
final case class NerMetadata(
    persons: Array[String],
    organizations: Array[String],
    locations: Array[String],
    vendor: String,
    client: String,
    signatory: String,
    contact: String)

object Ner {

  /** Version token baked into the NER candidate-dump path (the
    * Dedup.Version pattern, round-3 ADVICE #2): bump on ANY change to
    * tokenization, classification, or the assignment cue tables so a
    * stale /tmp dump can never green-light old kernel output. */
  val Version = "ner1"

  val orgSuffixes: Set[String] = Set(
    "inc", "llc", "ltd", "corp", "corporation", "company", "co",
    "gmbh", "ag", "sa", "srl", "bv", "plc", "group", "holdings",
    "partners", "associates", "systems", "solutions", "technologies",
    "industries", "consulting", "services", "enterprises", "labs")

  /** Common given names (public knowledge; small on purpose — a real
    * deployment swaps in a larger public list). */
  val firstNames: Set[String] = Set(
    "john", "james", "robert", "michael", "william", "david", "mary",
    "maria", "anna", "sarah", "emma", "olivia", "wei", "li", "chen",
    "aisha", "fatima", "omar", "ali", "pavel", "ivan", "dmitri",
    "lena", "sofia", "lucas", "hugo", "pierre", "marie", "hans",
    "klaus", "greta", "carlos", "ana", "jose", "juan", "kenji",
    "yuki", "priya", "raj", "amara", "kwame", "nina", "elena")

  val honorifics: Set[String] = Set("mr", "mrs", "ms", "dr", "prof")

  /** City/country gazetteer (public knowledge). */
  val locations: Set[String] = Set(
    "berlin", "london", "paris", "madrid", "rome", "vienna", "zurich",
    "geneva", "amsterdam", "brussels", "dublin", "oslo", "stockholm",
    "copenhagen", "helsinki", "warsaw", "prague", "lisbon", "barcelona",
    "munich", "hamburg", "boston", "chicago", "seattle", "austin",
    "denver", "toronto", "montreal", "sydney", "melbourne", "tokyo",
    "osaka", "seoul", "singapore", "mumbai", "delhi", "cairo", "lagos",
    "nairobi", "germany", "france", "spain", "italy", "japan", "canada",
    "australia", "india", "brazil", "mexico", "norway", "sweden",
    "poland", "portugal", "ireland", "austria", "switzerland",
    "new york", "los angeles", "san francisco", "hong kong")

  /** Capitalized sentence-position/connector words stripped from the
    * head of a candidate sequence (they are context, not name). */
  private val leadingConnectors: Set[String] = Set(
    "from", "to", "the", "a", "an", "dear", "contact", "signed", "by",
    "on", "our", "your", "at", "in", "for", "with", "and", "of",
    "attn", "via", "per", "see", "ask", "call", "email", "vendor",
    "client", "customer", "seller", "buyer", "behalf")

  private final case class Tok(text: String, start: Int, end: Int) {
    def lower: String = text.toLowerCase(java.util.Locale.ROOT)
    /** trailing-period-stripped lowercase ("Inc." -> "inc") */
    def bare: String = {
      val l = lower
      if (l.nonEmpty && (l.last == '.' || l.last == ',')) l.dropRight(1) else l
    }
    def isCap: Boolean = text.nonEmpty && Character.isUpperCase(text.charAt(0))
  }

  private val wordPattern = java.util.regex.Pattern.compile(
    "[\\p{L}][\\p{L}'.-]*")

  private def tokenize(text: String): Array[Tok] = {
    val m = wordPattern.matcher(text)
    val out = new ArrayBuffer[Tok](64)
    while (m.find()) out += Tok(m.group(), m.start(), m.end())
    out.toArray
  }

  /** One detected (label, text, start) candidate. */
  final case class Candidate(label: String, text: String, start: Int)

  def candidates(text: String): Array[Candidate] = {
    if (text == null || text.isEmpty) return Array.empty
    val toks = tokenize(text)
    val out = new ArrayBuffer[Candidate](8)
    var i = 0
    while (i < toks.length) {
      if (toks(i).isCap) {
        // grow a run of ADJACENT capitalized tokens (single-space gaps
        // only, so sentence boundaries ". X" and "label: X" break runs)
        var j = i
        while (j + 1 < toks.length && toks(j + 1).isCap &&
               toks(j + 1).start == toks(j).end + 1 &&
               text.charAt(toks(j).end) == ' ' &&
               !toks(j).text.endsWith(".") && !toks(j).text.endsWith(",")) j += 1
        val honor = i > 0 && honorifics.contains(toks(i - 1).bare)
        classify(text, toks, i, j, honor).foreach(out += _)
        i = j + 1
      } else i += 1
    }
    out.toArray
  }

  private def classify(text: String, toks: Array[Tok], i0: Int, j: Int,
                       honorific0: Boolean): Option[Candidate] = {
    // strip leading connector capitals
    var i = i0
    while (i <= j && leadingConnectors.contains(toks(i).bare)) i += 1
    // an honorific may precede the run or be its first token ("Dr Okafor")
    var honorific = honorific0
    if (i <= j && honorifics.contains(toks(i).bare)) { honorific = true; i += 1 }
    if (i > j) return None
    val run = (i to j).map(toks(_))
    def span(a: Int, b: Int): String = {
      var s = text.substring(toks(a).start, toks(b).end)
      while (s.nonEmpty && (s.last == '.' || s.last == ',')) s = s.dropRight(1)
      s
    }
    // ORG: run ends with a corporate suffix (>= 2 tokens so a bare
    // suffix word never becomes an org)
    if (j > i && orgSuffixes.contains(toks(j).bare))
      return Some(Candidate("ORG", span(i, j), toks(i).start))
    // PERSON: honorific prefix, or (first-name, Cap) bigram in the run
    if (honorific && j >= i)
      return Some(Candidate("PERSON", span(i, math.min(i + 2, j)), toks(i).start))
    var k = i
    while (k < j) {
      if (firstNames.contains(toks(k).bare) && toks(k + 1).isCap)
        return Some(Candidate("PERSON", span(k, k + 1), toks(k).start))
      k += 1
    }
    // LOC: one- or two-token gazetteer hit
    if (run.length <= 2 && locations.contains(run.map(_.bare).mkString(" ")))
      return Some(Candidate("LOC", span(i, j), toks(i).start))
    None
  }

  /** Cue lists exactly as the reference's (extractor.py:335-380).
    * Public so [[NerOracle]] renders the SQL mirror from the SAME
    * tables (the q39/q49 shared-rule-table pattern). */
  val vendorCues: Seq[String] = Seq("from", "seller", "vendor", "bill from")
  val clientCues: Seq[String] = Seq("to", "bill to", "customer", "client", "ship to")
  val signatoryCues: Seq[String] = Seq("signature", "signed by", "authorized", "behalf")
  val contactCues: Seq[String] = Seq("contact", "phone", "email", "attn")

  /** Full NER + contextual assignment over one document. */
  def extract(text: String): NerMetadata =
    assemble(text, candidates(text))

  /** Dedup + party assignment from a pre-computed candidate list — the
    * half of [[extract]] the DuckDB oracle re-derives from the NER
    * candidate dump (q40; the q43 candidate-dump pattern). Split out so
    * the engine path and the dump path share one kernel by
    * construction. */
  def assemble(text: String, cands: Array[Candidate]): NerMetadata = {
    def uniq(label: String): Array[String] = {
      val seen = new java.util.LinkedHashSet[String]()
      cands.foreach(c => if (c.label == label) seen.add(c.text))
      val out = new Array[String](seen.size)
      seen.toArray(out)
    }
    val persons = uniq("PERSON")
    val orgs = uniq("ORG")
    val locs = uniq("LOC")
    val lower = if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)

    // First-mention offsets memoized: an entity can be probed for up to
    // two roles, and each probe would otherwise re-scan the whole text.
    // Semantics stay EXACTLY the reference's `text_lower.find(e.lower())`
    // (extractor.py:334-343) — NOT the candidate's capitalized-mention
    // offset, which can differ when the entity string occurs earlier in
    // lowercase prose.
    val firstIdx = new java.util.HashMap[String, Integer]()
    def idxOf(entity: String): Int = {
      val cached = firstIdx.get(entity)
      if (cached != null) cached.intValue()
      else {
        val idx = lower.indexOf(entity.toLowerCase(java.util.Locale.ROOT))
        firstIdx.put(entity, Integer.valueOf(idx))
        idx
      }
    }
    // vendor: first of the top-3 orgs with a vendor cue in the 50 chars
    // before its first mention (extractor.py:334-343)
    def findBefore(entity: String, cues: Seq[String], window: Int): Boolean = {
      val idx = idxOf(entity)
      idx > 0 && {
        val ctx = lower.substring(math.max(0, idx - window), idx)
        cues.exists(ctx.contains)
      }
    }
    def findAround(entity: String, cues: Seq[String], before: Int, after: Int): Boolean = {
      val idx = idxOf(entity)
      idx > 0 && {
        val ctx = lower.substring(math.max(0, idx - before),
          math.min(lower.length, idx + after))
        cues.exists(ctx.contains)
      }
    }
    val vendor = orgs.take(3).find(findBefore(_, vendorCues, 50)).orNull
    val client = orgs.find(o => o != vendor && findBefore(o, clientCues, 50)).orNull
    val signatory = persons.find(findAround(_, signatoryCues, 100, 100)).orNull
    val contact = persons.find(p => p != signatory && findAround(p, contactCues, 50, 50)).orNull
    NerMetadata(persons, orgs, locs, vendor, client, signatory, contact)
  }
}
