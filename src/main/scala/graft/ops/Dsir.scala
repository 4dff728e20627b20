package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS: select raw-corpus documents whose hashed-n-gram profile
  * looks like a TARGET corpus). The published recipe: hash unigrams +
  * bigrams into B buckets, fit bag-of-buckets multinomials p_target and
  * p_raw, weight each raw document by its likelihood ratio, resample.
  *
  * Exactness adaptations (both documented deviations, same spirit as
  * [[LmScore]]'s fixed-point perplexity):
  *  - probabilities are add-one-smoothed FIXED-POINT micros
  *    (`(1e6·(n+1)) div (total+B)` in exact integer arithmetic) and the
  *    importance score is the linear bucket-count-weighted difference
  *    `Σ_b c_b·(pt_b − pr_b)` rather than the log-ratio sum — monotone
  *    in the same direction per bucket, bit-identical across engines
  *    (no transcendental functions), and the DuckDB oracle re-derives
  *    the whole pipeline including both models;
  *  - selection is deterministic top-quantile (score ≥ the exact
  *    interpolated 1−keep quantile) instead of Gumbel-top-k sampling —
  *    the paper's resampling needs randomness the oracle can't mirror;
  *    top-k is the ablation the paper itself reports.
  *
  * Feature hashing is the md5-prefix bucket (`conv(substr(md5(g),1,15),
  * 16,10) % B`) — proven equal to DuckDB's `CAST('0x'||…' AS BIGINT)`
  * bucket, so feature extraction is mirrorable gram-for-gram.
  *
  * 100 TB shape: ONE corpus-sized exchange (the per-doc bucket-count
  * combine, map-side-combinable: distinct buckets per doc ≪ tokens);
  * both models are ≤ B-row aggregates of that table; the delta model
  * BROADCASTS; scoring re-joins features to the broadcast delta and
  * folds per doc. The quantile cut broadcasts as a 1-row scalar
  * (the [[Balance]] percentile pattern — no global sort).
  */
object Dsir {

  /** Feature buckets (prime, like the paper's 10k hashed features). */
  val Buckets = 10007

  /** Fixed-point scale of the smoothed bucket probabilities. */
  val Micros = 1000000L

  /** Fraction of the raw corpus kept (top importance quantile). */
  val KeepFrac = 0.25

  /** md5-prefix feature bucket of a gram column (nonneg, < [[Buckets]]). */
  def bucket(gram: Column): Column =
    conv(substring(md5(gram), 1, 15), 16, 10).cast("long") % Buckets

  /** Exploded hashed features: (idCol, extra..., bucket) — one row per
    * unigram and per space-joined bigram occurrence; map-side only. */
  def featureOccurrences(df: DataFrame, idCol: String, textCol: String,
                         extra: Seq[Column] = Nil): DataFrame = {
    val withToks = df.select(
      (col(idCol) +: extra) :+ TextStats.lowerToks(col(textCol)).as("toks"): _*)
      .filter(size(col("toks")) >= 1)
    val keep = withToks.columns.filter(_ != "toks").map(col).toSeq
    withToks.select(keep :+ explode(concat(col("toks"), expr(
      "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"
    ))).as("gram"): _*)
      .select(keep :+ bucket(col("gram")).as("bucket"): _*)
  }

  /** Per-doc DSIR selection over `df`: target docs are the rows where
    * `targetPred` holds (they define p_target; every row contributes to
    * p_raw — the paper's raw distribution). Returns
    * (idCol, n_grams, score_micros, selected). */
  def select(df: DataFrame, idCol: String, textCol: String,
             targetPred: Column, keepFrac: Double = KeepFrac): DataFrame = {
    // the one corpus-sized exchange: per-doc bucket counts (the target
    // flag rides the explode — no join back to the corpus)
    val feat = featureOccurrences(df, idCol, textCol,
      extra = Seq(targetPred.as("__is_tgt")))
      .groupBy(col(idCol), col("__is_tgt"), col("bucket"))
      .agg(count(lit(1)).as("c"))

    // both models are B-bounded aggregates of feat
    val raw = feat.groupBy(col("bucket")).agg(sum(col("c")).as("n_raw"))
    val tgt = feat.filter(col("__is_tgt"))
      .groupBy(col("bucket")).agg(sum(col("c")).as("n_tgt"))
    val rawTot = raw.agg(sum(col("n_raw")).as("raw_tot"))
    val tgtTot = tgt.agg(sum(col("n_tgt")).as("tgt_tot"))

    // delta model: smoothed p_tgt − p_raw in micros, per observed bucket
    // (raw covers every observed bucket; unseen-in-target smooths to
    // (1e6·1) div (tgt_tot+B))
    val delta = raw
      .join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("bucket"),
        (expr(s"(${Micros}L * (coalesce(n_tgt, 0L) + 1)) DIV (tgt_tot + $Buckets)") -
          expr(s"(${Micros}L * (n_raw + 1)) DIV (raw_tot + $Buckets)")).as("d"))

    // score: features fold against the broadcast delta, per doc
    val scored = feat
      .join(broadcast(delta), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c") * col("d")).as("score_micros"))

    // deterministic top-quantile selection (exact interpolated quantile,
    // broadcast scalar — the q50 pattern, no global sort)
    val cut = scored.agg(
      expr(s"percentile(score_micros, ${1.0 - keepFrac})").as("cut"))
    scored.crossJoin(broadcast(cut))
      .select(col(idCol), col("n_grams"), col("score_micros"),
        (col("score_micros") >= col("cut")).as("selected"))
  }

  /** The DuckDB mirror: re-derives features, both models, the delta,
    * the scores and the quantile cut from the same relation.
    * `docsRel` must provide (doc_id, is_tgt, t). */
  def selectSql(docsRel: String, keepFrac: Double = KeepFrac): String =
    s"""WITH tl AS (
       |  SELECT doc_id, is_tgt,
       |    list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '') AS toks
       |  FROM $docsRel),
       |grams AS (
       |  SELECT doc_id, is_tgt, unnest(list_concat(toks,
       |    list_transform(generate_series(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i + 1]))) AS gram
       |  FROM tl WHERE len(toks) >= 1),
       |feat AS (
       |  SELECT doc_id, is_tgt,
       |    CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % $Buckets AS bucket,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM grams GROUP BY 1, 2, 3),
       |raw AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n_raw FROM feat GROUP BY 1),
       |tgt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS n_tgt FROM feat WHERE is_tgt GROUP BY 1),
       |tots AS (
       |  SELECT (SELECT CAST(sum(n_raw) AS BIGINT) FROM raw) AS raw_tot,
       |         (SELECT CAST(sum(n_tgt) AS BIGINT) FROM tgt) AS tgt_tot),
       |delta AS (
       |  SELECT r.bucket,
       |    ($Micros * (coalesce(t.n_tgt, 0) + 1)) // (tots.tgt_tot + $Buckets)
       |      - ($Micros * (r.n_raw + 1)) // (tots.raw_tot + $Buckets) AS d
       |  FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tots),
       |scored AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    CAST(sum(c * d) AS BIGINT) AS score_micros
       |  FROM feat JOIN delta USING (bucket) GROUP BY 1),
       |cut AS (SELECT quantile_cont(score_micros, ${1.0 - keepFrac}) AS cut FROM scored)
       |SELECT doc_id, n_grams, score_micros, score_micros >= cut.cut AS selected
       |FROM scored CROSS JOIN cut""".stripMargin
}
