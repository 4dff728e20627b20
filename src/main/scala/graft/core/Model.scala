package graft.core

import java.sql.Timestamp

/** Core data model of the extraction engine.
  *
  * Mirrors the reference's entities re-expressed for a columnar web-scale
  * table (see /root/reference/ocrworker/db/orm.py:65-77 for the `pages`
  * precedent and /root/reference/ocrworker/engines/base.py:36-90 for the
  * extraction output contract OCRResult/TextLine/Word).
  *
  * All types are case classes so Spark derives `ExpressionEncoder`s —
  * the whole pipeline stays inside Catalyst/Tungsten (no Kryo, no RDD).
  */

/** One input row: a Common-Crawl-style captured page.
  * Schema pinned by BASELINE.json input_hint:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** A character-offset span into `extracted_text`.
  * Char offsets are the precedent set by the reference's Entity.start/end
  * (/root/reference/ocrworker/nlp/extractor.py:17-18); web text has no
  * pixel geometry, so spans replace BoundingBox
  * (/root/reference/ocrworker/engines/base.py:16-33).
  */
final case class Span(start: Int, end: Int, kind: String, score: Double)

/** Extraction output for one page — the analog of the reference's
  * OCRResult (/root/reference/ocrworker/engines/base.py:53-90): text,
  * confidence, structural metadata, processing provenance. `error` is a
  * column, never an exception: extraction is total (cf. the reference's
  * catch-all fallbacks, /root/reference/ocrworker/pipeline/hybrid.py:146-155).
  */
final case class ExtractedDoc(
    url: String,
    warc_ts: Timestamp,
    extracted_text: String,
    spans: Array[Span],
    out_links: Array[String], // absolute http(s) hrefs in document order
                            // (the WAT-style out-link surface; empty for
                            // pdf/quarantine rows)
    n_links_found: Int,     // hrefs SEEN pre-cap: > out_links.length ⇔
                            // the MaxOutLinks backstop truncated (caps
                            // are never silent — a link-farm page on
                            // real WARC ingest is auditable row-level)
    payload_kind: String,   // "html" | "pdf" | "unknown"
    page_count: Int,        // PDF branch; 1 for html, 0 for junk
    n_blocks: Int,
    n_content_blocks: Int,
    confidence: Double,     // mean content-classifier score
    lang: String,
    engine: String,         // which classifier produced the text
                            // (OCRResult.engine, engines/base.py:58)
    fallback_used: Boolean, // cascade fell through to a fallback engine
                            // (hybrid.py:123-161 engines_tried semantics)
    error: String,          // null when clean
    extraction_version: String
)

/** One tokenized/classified text block of an HTML document.
  * The web analog of the reference's geometric region features
  * (area / aspect / density thresholds at
  * /root/reference/ocrworker/signature_extractor.py:33-37 and
  * /root/reference/ocrworker/form_detector.py:341-367): here the features
  * are word count, link density, tag depth, heading level.
  */
final case class Block(
    start: Int,             // [start, end) span into the builder's doc-level char store
    end: Int,               // (no per-block String: ~30 String allocs/doc saved on the hot path)
    words: Int,
    linkedWords: Int,
    tagDepth: Int,
    headingLevel: Int,      // 0 = not a heading; 1..6 for h1..h6
    inBoilerplateTag: Boolean,
    var isContent: Boolean = false,
    var score: Double = 0.0
) {
  def linkDensity: Double = if (words == 0) 0.0 else linkedWords.toDouble / words
  def length: Int = end - start
}

object ExtractionVersion {
  /** Version tag carried in lineage; bump when the byte contract changes
    * (the analog of the reference's monotonic DocumentVersion.number,
    * /root/reference/ocrworker/db/api.py:128-137).
    * v2: density->relaxed confidence cascade (threshold 0.7).
    * v3: out_links column (absolute hrefs captured by the tokenizer).
    * v4: n_links_found column (pre-cap href count, so the MaxOutLinks
    *     backstop is auditable instead of silent — round-4 ADVICE #2). */
  val current: String = "graft-extract-4"
}
