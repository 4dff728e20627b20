package graft.nlp

/** DuckDB mirror of [[Ner.assemble]] — the dedup + contextual party
  * assignment half of the NER engine, re-derived in pure SQL from the
  * NER candidate dump joined back to the extraction dump's text
  * (the q43 candidate-dump pattern: detection stays on the engine
  * surface with NerSpec planted-truth coverage; everything downstream
  * of the candidate list is independently recomputed by the oracle).
  *
  * Semantics mirrored 1:1 from Ner.assemble / the reference's
  * extractor.py:329-381:
  *  - per-label dedup keeps FIRST-OCCURRENCE order (LinkedHashSet ≡
  *    ORDER BY min(start));
  *  - first-mention index is `text_lower.find(entity_lower)` — strpos
  *    over lower(), NOT the candidate's start (the capitalized mention
  *    can occur after a lowercase one);
  *  - vendor: first of the top-3 orgs with a vendor cue in the 50
  *    chars BEFORE the first mention; client: first org ≠ vendor with
  *    a client cue in the same window shape; signatory: first person
  *    with a cue within ±100; contact: first person ≠ signatory with
  *    a cue within ±50. All cue checks are substring containment on
  *    the lowercase context window, and every probe requires idx > 0.
  *
  * The cue predicates are rendered from [[Ner]]'s own cue tables so
  * the mirror cannot drift from the engine (shared-rule-table
  * pattern, q39/q49/q28).
  *
  * Index arithmetic note: Java substring/indexOf count UTF-16 code
  * units while DuckDB strpos/substr count codepoints; these agree for
  * every BMP character, and the generator corpus contains no astral
  * codepoints, so window arithmetic is engine-portable here.
  */
object NerOracle {

  /** `'needle' IN context` as SQL, escaped. */
  private def cueSql(ctx: String, cues: Seq[String]): String =
    cues.map(c => s"strpos($ctx, '${c.replace("'", "''")}') > 0")
      .mkString("(", " OR ", ")")

  /** Full q40 mirror. `nerRel` / `docsRel` are FROM-clause relations:
    * the candidate dump and the (url, extracted_text) projection. */
  def metadataSql(nerRel: String, docsRel: String): String = {
    val vcue = cueSql("b50", Ner.vendorCues)
    val ccue = cueSql("b50", Ner.clientCues)
    val scue = cueSql("a100", Ner.signatoryCues)
    val tcue = cueSql("a50", Ner.contactCues)
    s"""WITH docs AS (
       |  SELECT url, lower(t) AS lt FROM $docsRel
       |), cand AS (
       |  SELECT url, label, text, min(start) AS s0
       |  FROM $nerRel GROUP BY url, label, text
       |), ent AS (
       |  SELECT c.url, c.label, c.text, c.s0,
       |         row_number() OVER (PARTITION BY c.url, c.label ORDER BY c.s0) AS rnk,
       |         strpos(d.lt, lower(c.text)) - 1 AS idx,
       |         d.lt
       |  FROM cand c JOIN docs d USING (url)
       |), feat AS (
       |  SELECT url, label, text, rnk, idx,
       |    CASE WHEN idx > 0 THEN substr(lt, greatest(0, idx-50)+1, idx - greatest(0, idx-50)) ELSE '' END AS b50,
       |    CASE WHEN idx > 0 THEN substr(lt, greatest(0, idx-100)+1, least(length(lt), idx+100) - greatest(0, idx-100)) ELSE '' END AS a100,
       |    CASE WHEN idx > 0 THEN substr(lt, greatest(0, idx-50)+1, least(length(lt), idx+50) - greatest(0, idx-50)) ELSE '' END AS a50
       |  FROM ent
       |), vend AS (
       |  SELECT url, min_by(text, rnk) FILTER (WHERE rnk <= 3 AND idx > 0 AND $vcue) AS vendor
       |  FROM feat WHERE label = 'ORG' GROUP BY url
       |), cli AS (
       |  SELECT f.url, min_by(f.text, f.rnk) FILTER (
       |    WHERE f.idx > 0 AND $ccue AND (v.vendor IS NULL OR f.text <> v.vendor)) AS client
       |  FROM feat f LEFT JOIN vend v ON f.url = v.url
       |  WHERE f.label = 'ORG' GROUP BY f.url
       |), sig AS (
       |  SELECT url, min_by(text, rnk) FILTER (WHERE idx > 0 AND $scue) AS signatory
       |  FROM feat WHERE label = 'PERSON' GROUP BY url
       |), con AS (
       |  SELECT f.url, min_by(f.text, f.rnk) FILTER (
       |    WHERE f.idx > 0 AND $tcue AND (s.signatory IS NULL OR f.text <> s.signatory)) AS contact
       |  FROM feat f LEFT JOIN sig s ON f.url = s.url
       |  WHERE f.label = 'PERSON' GROUP BY f.url
       |), lists AS (
       |  SELECT url,
       |    coalesce(string_agg(text, '|' ORDER BY s0) FILTER (WHERE label = 'PERSON'), '') AS persons_csv,
       |    CAST(count(*) FILTER (WHERE label = 'PERSON') AS INT) AS n_persons,
       |    coalesce(string_agg(text, '|' ORDER BY s0) FILTER (WHERE label = 'ORG'), '') AS orgs_csv,
       |    CAST(count(*) FILTER (WHERE label = 'ORG') AS INT) AS n_orgs,
       |    coalesce(string_agg(text, '|' ORDER BY s0) FILTER (WHERE label = 'LOC'), '') AS locs_csv,
       |    CAST(count(*) FILTER (WHERE label = 'LOC') AS INT) AS n_locs
       |  FROM cand GROUP BY url
       |)
       |SELECT l.url, l.persons_csv, l.n_persons, l.orgs_csv, l.n_orgs,
       |       l.locs_csv, l.n_locs,
       |       v.vendor, c.client, s.signatory, co.contact
       |FROM lists l
       |LEFT JOIN vend v ON l.url = v.url
       |LEFT JOIN cli  c ON l.url = c.url
       |LEFT JOIN sig  s ON l.url = s.url
       |LEFT JOIN con co ON l.url = co.url""".stripMargin
  }
}
