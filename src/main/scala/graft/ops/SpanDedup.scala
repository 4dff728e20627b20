package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document substring-level exact dedup — the token-span form of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al., ACL 2022, public method): a k-token span that recurs VERBATIM
  * in two or more documents is train-set redundancy that line- and
  * document-level dedup both miss (a license paragraph pasted mid-page,
  * a syndicated lede under different boilerplate). The reference
  * pipeline has no analog; this is part of the LLM-curation surface.
  *
  * Lee et al. build a suffix array over the concatenated corpus — a
  * single-machine design. The Spark-native shape is rolling-hash
  * blocking: every doc emits md5 digests of its rolling k-token
  * windows, a digest appearing under ≥2 distinct doc ids marks a
  * cross-document duplicated span. Span TEXT never crosses a shuffle —
  * the explode emits (doc_id, digest) pairs (~30 bytes/token at any
  * corpus size), aggregated per (digest, doc) map-side-combinably and
  * counted per digest with one unordered window. Skew is bounded: the
  * hottest digest (a corpus-wide boilerplate span) concentrates one
  * shuffle key of at most #docs rows, the same bound as exact
  * doc-level dedup.
  *
  * Summary granularity (per doc: how many spans, how many duplicated)
  * mirrors [[LineDedup.summarize]]; the removal variant is a trivial
  * anti-join on the same span table. Tokenization is the text-family
  * rule (lowercase, split `\s+`, drop empties) so the DuckDB oracle
  * re-derives spans verbatim.
  */
object SpanDedup {

  /** Rolling k-token span digests: (idCol, h) — one row per window
    * position, md5 of the space-joined span as 16 RAW bytes (half the
    * shuffle key of the hex string; the 128-bit space keeps grouping
    * collision-free, and the oracle never compares digests — it
    * re-derives counts from the text). Docs with < k tokens contribute
    * nothing. The digest array comes from ONE native expression
    * ([[graft.functions.SpanDigests]]) instead of a
    * transform/slice/concat_ws/md5 lambda pipeline — the span string
    * never exists, and token bytes are fetched once per document. */
  def spans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
        TextStats.lowerToks(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col(idCol),
        explode(graft.functions.SpanDigests(col("toks"), k)).as("h"))

  /** Per-doc span-dedup summary: total rolling spans and how many of
    * them also occur in at least one OTHER document.
    *
    * Shape: ONE pass over the span table, ZERO joins — the first cut
    * (two joins back onto the span table) recomputed the explode three
    * times and ran 11-20 s at sf0.1. Here: (1) groupBy (h, id) folds
    * within-doc repeats into a multiplicity `k` (map-side combine does
    * the folding); (2) an unordered window over `h` counts distinct
    * docs per digest (the table is already one row per (h, id), so
    * count(*) IS the distinct-doc count — no countDistinct expand, no
    * sort); (3) groupBy(id) sums k and the flagged k. Three exchanges
    * of digest-sized rows total, each skinnier than the last. */
  def summarize(df: DataFrame, idCol: String, textCol: String,
                k: Int = 10): DataFrame = {
    val hd = spans(df, idCol, textCol, k)
      .groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("k"))
    val nDocs = Window.partitionBy(col("h"))
    hd.withColumn("n_docs", count(lit(1)).over(nDocs))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_spans"),
        sum(when(col("n_docs") >= 2, col("k")).otherwise(lit(0L))).as("n_dup_spans"))
  }

  /** DuckDB mirror of [[summarize]]: same tokenizer, same 1-based
    * window enumeration, same md5-of-space-joined-span keying, same
    * ≥2-distinct-docs rule. `docsRel` must expose (doc_id, t). */
  def summarySql(docsRel: String, k: Int = 10): String =
    s"""WITH tl AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '') AS toks
       |  FROM $docsRel),
       |sp AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - ${k - 1}),
       |    i -> md5(array_to_string(toks[i:i + ${k - 1}], ' ')))) AS h
       |  FROM tl WHERE len(toks) >= $k),
       |dup AS (
       |  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM sp GROUP BY h)
       |  WHERE nd >= 2)
       |SELECT sp.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
       |FROM sp LEFT JOIN dup ON sp.h = dup.h
       |GROUP BY sp.doc_id""".stripMargin
}
