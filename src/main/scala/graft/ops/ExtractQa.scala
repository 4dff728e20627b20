package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extraction QA — token-level agreement between a RE-extraction and
  * the text column the crawl table already carries (the `text` field of
  * the input-hint schema: a degraded raw-text snippet in CC-style
  * crawls). This is how a new extraction version is validated at scale
  * before it replaces the old one: run it over a sample, score each
  * document's token agreement against the incumbent text, and alert on
  * hosts whose agreement dropped — the web-pipeline analog of the
  * reference's per-document confidence check before committing an OCR
  * result (`ocrworker/tasks.py` gates commits on engine confidence;
  * here the "second engine" is the text the table already has).
  *
  * The metric is Cleaneval-style token precision/recall/F1 over BAG
  * (multiset) intersection: per url, tokens are `\s+` splits (the q14
  * convention the DuckDB oracle shares), counted per (url, token) on
  * each side, and the overlap is Σ min(count_ext, count_ref). All
  * ratios are floor-divided integer MICROS so the oracle re-derives
  * every row bit-for-bit — no float drift.
  *
  * Scale shape (100 TB): one equi-join per side on (url, token) — the
  * explode is map-side before the shuffle, the groupBy makes the
  * partial counts map-side-combinable, and the final join reuses the
  * (url, token) partitioning of both groupBys (no third shuffle). The
  * shuffled rows are (url, token, count) — bounded by corpus token
  * count, which is why a real deployment runs this on a SAMPLED slice
  * (the caller picks the sample; the operator itself never caps
  * silently). Per-host aggregation is a standard map-side-combinable
  * roll-up.
  */
object ExtractQa {

  /** Per-host token-agreement report.
    *
    * @param ext re-extraction output: (url, extracted_text)
    * @param ref incumbent text: (url, text) — rows with empty text are
    *            ignored (nothing to agree with)
    * @return one row per host: document count, token totals on both
    *         sides, bag-intersection total, micro-averaged P/R/F1 in
    *         floor micros, and the macro F1 SUM in micros (callers
    *         divide by n_docs for the mean — keeping the sum exact
    *         avoids a second floor that would hide per-doc variance)
    */
  def tokenAgreement(ext: DataFrame, ref: DataFrame): DataFrame = {
    val toks = (c: org.apache.spark.sql.Column) =>
      filter(split(c, "\\s+"), t => t =!= "")
    val e = ext.select(col("url"), toks(col("extracted_text")).as("toks"))
    val r = ref.filter(col("text") =!= "")
      .select(col("url"), toks(col("text")).as("toks"))

    def counted(df: DataFrame, side: String): DataFrame =
      df.select(col("url"), explode(col("toks")).as("tok"))
        .groupBy("url", "tok").agg(count(lit(1)).as(s"c_$side"))

    val common = counted(e, "ext").join(counted(r, "ref"), Seq("url", "tok"))
      .groupBy("url")
      .agg(sum(least(col("c_ext"), col("c_ref"))).as("common"))

    val sizes = e.select(col("url"), size(col("toks")).cast("long").as("n_ext"))
      .join(r.select(col("url"), size(col("toks")).cast("long").as("n_ref")), "url")

    val perDoc = sizes.join(common, Seq("url"), "left")
      .na.fill(0L, Seq("common"))
      // f1 = 2·I/(E+R): single floor division, no P/R chaining — and
      // n_ref ≥ 1 (empty refs were filtered), so E+R never divides by 0
      .withColumn("f1_micros",
        expr("2000000L * common div (n_ext + n_ref)"))

    perDoc
      .groupBy(Hosts.hostOf(col("url")).as("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ext")).as("ext_toks"),
        sum(col("n_ref")).as("ref_toks"),
        sum(col("common")).as("common_toks"),
        sum(col("f1_micros")).as("macro_f1_micros_sum"))
      .withColumn("micro_p_micros",
        expr("CASE WHEN ext_toks = 0 THEN 0L ELSE 1000000L * common_toks div ext_toks END"))
      .withColumn("micro_r_micros", expr("1000000L * common_toks div ref_toks"))
      .withColumn("micro_f1_micros",
        expr("2000000L * common_toks div (ext_toks + ref_toks)"))
  }
}
