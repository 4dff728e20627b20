package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level corpus curation — the domain-granularity filtering pass
  * of web-scale pipelines (public method: RefinedWeb/CCNet drop whole
  * domains whose aggregate signals — duplication rate, quality — fall
  * below thresholds, instead of judging documents one at a time). No
  * reference analog; corpus-level curation.
  *
  * Scale shape: two equi-shuffles, both safe at 10^12 rows. (1) the
  * exact-dup flag groups by md5(text) — the digest crosses the
  * shuffle, never the text; (2) the host rollup groups by host with
  * map-side partial aggregation, so a zipfian head host (the test
  * generator's biggest is ~15% of the corpus) contributes one partial
  * row per task, not a single hot reduce partition of raw rows.
  *
  * The keep decision is integer-exact on purpose — rounded confidence
  * micros and `2·n_dup ≤ n_docs` instead of float averages — so the
  * DuckDB oracle reproduces it bit-for-bit with no float-rounding
  * escape hatch (the q44 conf_micros rule).
  */
object DomainCuration {

  /** Average-confidence keep threshold in micros (0.65: the corpus
    * median host sits at ~0.655, so the split is exercised both ways
    * at every sf). Shared with the SQL oracle. */
  val MinAvgConfMicros = 650000L

  /** Per-host curation table: (host, n_docs, n_dup, n_langs,
    * conf_micros_sum, keep). A doc counts as dup when its exact text
    * digest occurs more than once corpus-wide; a host is kept when
    * at most half its docs are dups AND its average confidence is at
    * least [[MinAvgConfMicros]]. */
  def summarize(df: DataFrame, urlCol: String, textCol: String,
                langCol: String, confCol: String): DataFrame = {
    val d = df.select(
      Hosts.hostOf(col(urlCol)).as("host"),
      md5(col(textCol).cast("binary")).as("h"),
      round(col(confCol) * 1000000).cast("long").as("conf_micros"),
      col(langCol).as("lang"))
    // only digests that actually repeat matter for the dup flag — web
    // corpora are mostly unique, so pre-filtering shrinks the join's
    // build side from |corpus| to |dup digests| (~5% here; AQE then
    // picks a broadcast join at bench scale, and at 100 TB the
    // remaining equi-join shuffles digests only, never text)
    val dupDigests = d.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
    d.join(dupDigests, Seq("h"), "left")
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("occ").isNotNull, 1L).otherwise(0L)).as("n_dup"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("conf_micros")).as("conf_micros_sum"))
      .withColumn("keep",
        col("n_dup") * 2 <= col("n_docs") &&
          col("conf_micros_sum") >= lit(MinAvgConfMicros) * col("n_docs"))
  }

  /** DuckDB mirror of [[summarize]]: host via split_part (≡ the
    * codegen'd substring_index form for scheme://host/path urls),
    * dup flag re-derived from a full md5 self-count, and the SAME
    * integer keep rule. `docsRel` must expose
    * (url, t, lang, confidence). */
  def summarySql(docsRel: String): String =
    s"""WITH d AS (
       |  SELECT split_part(url, '/', 3) AS host,
       |         md5(t) AS h,
       |         CAST(round(confidence * 1000000) AS BIGINT) AS cm,
       |         lang
       |  FROM $docsRel
       |), occ AS (
       |  SELECT h, count(*) AS occ FROM d GROUP BY h
       |)
       |SELECT d.host,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN occ.occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
       |  CAST(sum(d.cm) AS BIGINT) AS conf_micros_sum,
       |  (2 * sum(CASE WHEN occ.occ > 1 THEN 1 ELSE 0 END) <= count(*)
       |   AND sum(d.cm) >= $MinAvgConfMicros * count(*)) AS keep
       |FROM d JOIN occ ON d.h = occ.h
       |GROUP BY d.host""".stripMargin
}
