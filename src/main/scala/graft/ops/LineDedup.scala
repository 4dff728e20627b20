package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact deduplication across the corpus — the C4 recipe
  * (Raffel et al. 2020 §2.2 deduplicate repeated boilerplate spans
  * corpus-wide, keeping one occurrence) at line granularity, the form
  * most web pipelines ship: a line duplicated across pages (cookie
  * banners, nav footers, license blurbs) is kept ONLY at its first
  * occurrence and dropped everywhere else.
  *
  * Scale shape: the line TEXT never crosses a shuffle — lines are
  * keyed by md5 digest, so the two shuffles move (digest, url, pos)
  * triples only (~50 bytes/line at any corpus size). First occurrence
  * is the lexicographic minimum of (url, pos): deterministic, stable
  * under partitioning, and re-derivable by any engine — the DuckDB
  * oracle recomputes keeper assignment and the per-doc kept/dropped
  * counts from the same extraction dump.
  *
  * Only lines of >= `minChars` characters participate (short lines —
  * headings, list bullets — legitimately repeat; C4 used a
  * three-sentence window for the same reason).
  */
object LineDedup {

  /** Exploded long-line table: (idCol, pos, line_h). */
  def longLines(df: DataFrame, idCol: String, textCol: String,
                minChars: Int): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(length(col("line")) >= minChars)
      .select(col(idCol), col("pos"), md5(col("line").cast("binary")).as("line_h"))

  /** Per-doc dedup summary: total long lines, lines kept (this doc
    * holds the first occurrence), lines dropped (canonical occurrence
    * lives in another doc / earlier position).
    *
    * Shape: NO line-level join. Each distinct line contributes exactly
    * one kept occurrence — at its keeper (id, pos) — so `n_kept` per
    * doc is just a count over the keeper table grouped by keeper id,
    * joined to the per-doc line count at DOC granularity. The naive
    * form (lines ⋈ keeper back at line granularity, 11.5 s at sf0.1)
    * re-shuffled every line row twice; this one shuffles lines once
    * per aggregate and joins two doc-sized tables. */
  def summarize(df: DataFrame, idCol: String, textCol: String,
                minChars: Int = 50): DataFrame = {
    val lines = longLines(df, idCol, textCol, minChars)
    val perDoc = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val kept = lines
      .groupBy(col("line_h"))
      .agg(min(struct(col(idCol), col("pos"))).as("k"))
      .groupBy(col("k")(idCol).as(idCol))
      .agg(count(lit(1)).as("n_kept"))
    perDoc.join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** DuckDB mirror of [[summarize]]: same line split (chr(10)), same
    * length gate, same md5 keying, keeper re-derived as min(url) then
    * min(pos) within that url (≡ the lexicographic struct minimum).
    * `docsRel` must expose (url, t). */
  def summarySql(docsRel: String, minChars: Int = 50): String =
    s"""WITH p AS (
       |  SELECT url, string_split(t, chr(10)) AS ps FROM $docsRel
       |), l0 AS (
       |  SELECT url, unnest(ps) AS line, unnest(range(len(ps))) AS pos FROM p
       |), lines AS (
       |  SELECT url, pos, md5(line) AS h FROM l0 WHERE length(line) >= $minChars
       |), ku AS (
       |  SELECT h, min(url) AS kurl FROM lines GROUP BY h
       |), kp AS (
       |  SELECT l.h, k.kurl, min(l.pos) AS kpos
       |  FROM lines l JOIN ku k ON l.h = k.h AND l.url = k.kurl
       |  GROUP BY l.h, k.kurl
       |)
       |SELECT l.url,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CASE WHEN l.url = kp.kurl AND l.pos = kp.kpos THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(count(*) - sum(CASE WHEN l.url = kp.kurl AND l.pos = kp.kpos THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       |FROM lines l JOIN kp ON l.h = kp.h
       |GROUP BY l.url""".stripMargin
}
