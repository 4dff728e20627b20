package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed trained text classifier — the fastText-classifier rung of
  * a CCNet/LLaMA-style curation pipeline (Wenzek et al. 2020 train a
  * linear classifier to keep "Wikipedia-like" pages; the reference's
  * analog is the keyword doc-type classifier at
  * `ocrworker/classification/detector.py`, which is rule-based — this is
  * the LEARNED version of that stage), expressed as full-batch perceptron
  * training in exact integer arithmetic.
  *
  * Model: y = sign(w·x) with w ∈ ℤ^F. Full-batch update (the batch
  * perceptron — Rosenblatt's rule summed over the epoch's mistakes):
  *
  *   w⁰ = 0;  wᵗ⁺¹ = wᵗ + Σ_{i : yᵢ·(wᵗ·xᵢ) ≤ 0} yᵢ·xᵢ
  *
  * Everything is a Long: features are integer counts, labels ±1, so the
  * per-iteration gradient is a SUM — map-side combinable, associative,
  * bit-identical at any parallelism (the same argument as HostRank's
  * fixed-point ranks; float SGD would be order-dependent AND
  * sequential). Full-batch is the distributed-correct choice: classic
  * per-example SGD is inherently serial (each update depends on the
  * last), while the batch gradient is one partial+final aggregate per
  * epoch over any number of executors.
  *
  * Scale shape: per iteration ONE aggregate over the training table
  * (map-side partials → F scalars) and one broadcast of the F weights
  * back into the next pass's margin expression — the k×d-scalar collect
  * pattern the IVF quantizer documents. The training table is scanned T
  * times; at 100 TB you train on a SAMPLE (CCNet trains on ~millions of
  * rows, not the corpus — the corpus is what you SCORE, map-side, with
  * the final weights). Overflow headroom: |Δw_j| ≤ N·max|x_j| per
  * iteration, so Long arithmetic holds to N·max|x|·T ≈ 2⁶³ — at 10¹²
  * training rows you'd be sampling long before the bound bites.
  *
  * Default features (all SQL-mirrorable, over the documents table): a
  * bias, the doc's token count, and per-language stopword hits from
  * [[TextStats.stopwords]] (one rule source emits both engines); label
  * +1 ⇔ lang = 'en'. The trained weights learn "English stopword hits
  * predict English" — and the per-iteration mistake counts prove the
  * model is APPLIED correctly, not just trained.
  */
object Perceptron {

  val Iters = 4

  /** Feature names in output order (w_<name> columns). */
  val FeatureNames: Seq[String] = Seq("bias", "toks", "eng", "deu", "fra")

  /** The feature/label projection over a (text, lang) relation — one
    * rule source for both engines (the EntityOracle pattern). */
  def features(text: Column, lang: Column): Seq[(String, Column)] = {
    val toks = TextStats.lowerToks(text)
    def hits(set: Set[String]): Column = {
      val arr = array(set.toSeq.sorted.map(lit): _*)
      size(filter(toks, t => array_contains(arr, t))).cast("long")
    }
    Seq(
      "y" -> when(lang === "en", lit(1L)).otherwise(lit(-1L)),
      "x_bias" -> lit(1L),
      "x_toks" -> size(toks).cast("long"),
      "x_eng" -> hits(TextStats.stopwords("eng")),
      "x_deu" -> hits(TextStats.stopwords("deu")),
      "x_fra" -> hits(TextStats.stopwords("fra")))
  }

  private def featNames: Seq[String] = FeatureNames.map("x_" + _)

  /** Train [[Iters]] full-batch rounds over a (text, lang) DataFrame.
    * Output: one row per iteration — (iter, n_train, n_mis, w_bias,
    * w_toks, w_eng, w_deu, w_fra), where n_mis counts the mistakes the
    * PRE-update weights make (iteration t's gradient support) — the
    * training trajectory, so the oracle value-checks every round, not
    * just the final weights. */
  def train(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feat = docs.select(features(col("text"), col("lang")).map {
      case (n, c) => c.as(n) }: _*).localCheckpoint(true)

    var w = FeatureNames.map(_ => 0L)
    val rows = (1 to Iters).map { t =>
      val margin = featNames.zip(w)
        .map { case (f, wi) => col(f) * lit(wi) }
        .reduce(_ + _) * col("y")
      val mis = feat.filter(margin <= 0)
      val aggs = count(lit(1L)).as("n_mis") +:
        featNames.map(f => coalesce(sum(col("y") * col(f)), lit(0L)).as("d_" + f))
      // F+1 scalars to the driver per round — the bounded k×d collect
      val r = mis.agg(aggs.head, aggs.tail: _*).collect()(0)
      val nMis = r.getLong(0)
      w = w.zipWithIndex.map { case (wi, j) => wi + r.getLong(j + 1) }
      (t.toLong, nMis) -> w
    }
    val nTrain = feat.count()
    rows.map { case ((t, nMis), wt) =>
      (t, nTrain, nMis, wt(0), wt(1), wt(2), wt(3), wt(4))
    }.toDF("iter", "n_train", "n_mis",
      "w_bias", "w_toks", "w_eng", "w_deu", "w_fra")
  }

  /** The identical training loop as DuckDB SQL, iterations unrolled from
    * the same constants and the same [[TextStats.stopwords]] table.
    * `docsRel` must provide (text, lang). Returns a full SELECT. */
  def oracleSql(docsRel: String): String = {
    def lits(set: Set[String]) =
      set.toSeq.sorted.map(w => "'" + w.replace("'", "''") + "'").mkString("[", ",", "]")
    val sb = new StringBuilder
    sb.append(
      s"""WITH feat AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         |    CAST(1 AS BIGINT) AS x_bias,
         |    CAST(len(toks) AS BIGINT) AS x_toks,
         |    CAST(len(list_filter(toks, t -> list_contains(${lits(TextStats.stopwords("eng"))}, t))) AS BIGINT) AS x_eng,
         |    CAST(len(list_filter(toks, t -> list_contains(${lits(TextStats.stopwords("deu"))}, t))) AS BIGINT) AS x_deu,
         |    CAST(len(list_filter(toks, t -> list_contains(${lits(TextStats.stopwords("fra"))}, t))) AS BIGINT) AS x_fra
         |  FROM (SELECT lang,
         |          list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
         |        FROM $docsRel)),
         |w0 AS (SELECT CAST(0 AS BIGINT) AS w_bias, CAST(0 AS BIGINT) AS w_toks,
         |       CAST(0 AS BIGINT) AS w_eng, CAST(0 AS BIGINT) AS w_deu, CAST(0 AS BIGINT) AS w_fra)""".stripMargin)
    val fn = featNames // x_bias, x_toks, ...
    val wn = FeatureNames.map("w_" + _)
    for (t <- 1 to Iters) {
      val dot = fn.zip(wn).map { case (x, w) => s"w.$w * f.$x" }.mkString(" + ")
      val deltas = fn.zip(wn).map { case (x, w) =>
        s"COALESCE(sum(CASE WHEN m.margin <= 0 THEN m.y * m.$x END), 0) AS d_$x" }.mkString(",\n    ")
      val next = wn.zip(fn).map { case (w, x) =>
        s"CAST((SELECT $w FROM w${t - 1}) + d_$x AS BIGINT) AS $w" }.mkString(",\n    ")
      sb.append(",\n")
      sb.append(
        s"""m$t AS (
           |  SELECT f.*, f.y * ($dot) AS margin FROM feat f CROSS JOIN w${t - 1} w),
           |g$t AS (
           |  SELECT CAST(count(CASE WHEN m.margin <= 0 THEN 1 END) AS BIGINT) AS n_mis,
           |    $deltas
           |  FROM m$t m),
           |w$t AS (
           |  SELECT $next FROM g$t)""".stripMargin)
    }
    val finals = (1 to Iters).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS iter,
         |  (SELECT CAST(count(*) AS BIGINT) FROM feat) AS n_train,
         |  (SELECT n_mis FROM g$t) AS n_mis,
         |  w_bias, w_toks, w_eng, w_deu, w_fra FROM w$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    sb.append("\n").append(finals)
    sb.toString
  }

  /** Driver-side exact reference for the differential spec. Rows are
    * (y, features); returns the per-iteration (n_mis, weights). */
  def referenceTrain(rows: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long])] = {
    var w = FeatureNames.map(_ => 0L)
    (1 to Iters).map { _ =>
      val mis = rows.filter { case (y, x) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0L }
      w = w.zipWithIndex.map { case (wi, j) =>
        wi + mis.map { case (y, x) => y * x(j) }.sum }
      (mis.size.toLong, w)
    }
  }
}
