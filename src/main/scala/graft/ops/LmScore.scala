package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-self-trained bigram language-model scoring — the standard
  * statistical-quality signal of web-corpus pipelines (CCNet / Wenzek
  * et al. 2020 score documents against a KenLM n-gram model; Gopher and
  * RefinedWeb gate on the same idea): a document whose token
  * transitions are IMPROBABLE under the corpus's own bigram statistics
  * is gibberish, boilerplate soup, or wrong-language residue. Training
  * the model ON the corpus itself keeps the operator self-contained —
  * no external model file — and is exactly a two-pass aggregate, which
  * is the part that matters at 100 TB.
  *
  * All arithmetic is INTEGER fixed-point (micros), the house rule for
  * oracle-exact scores (same as q70's exact-integer PMI): per distinct
  * doc-bigram, the add-one-smoothed conditional probability
  *
  *   p_micros(a→b) = (c(a,b) + 1) · 1_000_000 div (c(a,·) + V)
  *
  * where c(a,b) is the corpus bigram count, c(a,·) = Σ_b c(a,b) the
  * LHS margin (derived from the bigram table itself — no second corpus
  * scan), and V the corpus vocabulary size (the Laplace denominator).
  * Integer div is order-independent and bit-identical in every engine,
  * so the DuckDB oracle re-derives the score exactly; a float
  * cross-entropy would hash-diverge on libm's ln. Downstream ranking
  * is monotone in the score either way.
  *
  * Scale shape: pass 1 is a map-side-combinable groupBy building the
  * bigram count table (keys are token pairs, ~tens of bytes; the count
  * table is vocabulary-sized, NOT corpus-sized). Pass 2 aggregates each
  * doc's bigram multiplicities (groupBy, map-side combine), equi-joins
  * them to the count table on (a, b), and sums per doc. The margin and
  * vocab scalars broadcast. Stopword-headed bigrams are the hottest
  * keys, but the count-table side holds ONE row per key, so AQE's
  * broadcast/skew handling applies; nothing sorts, nothing windows.
  */
object LmScore {

  private def toks(textCol: String) =
    filter(split(lower(col(textCol)), "\\s+"), x => x =!= "")

  /** Doc-level bigram multiplicities: (idCol, a, b, k). */
  def docBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), toks(textCol).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] as a, toks[i+1] as b))")).as("p"))
      .select(col(idCol), col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col(idCol), col("a"), col("b"))
      .agg(count(lit(1)).as("k"))

  /** Per-doc LM score: (idCol, n_bigrams, sum_p_micros, avg_p_micros).
    * High avg = fluent under the corpus model; low = surprising. Docs
    * with < 2 tokens are absent (no bigrams, both engines agree). */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docBigrams(df, idCol, textCol)
    val bi = bg.groupBy(col("a"), col("b")).agg(sum(col("k")).as("n_ab"))
    val margin = bi.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    val vocab = df.select(explode(toks(textCol)).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    bg.join(bi, Seq("a", "b"))
      .join(margin, Seq("a"))
      .crossJoin(broadcast(vocab))
      .withColumn("p_micros", expr("((n_ab + 1) * 1000000) div (n_a + v)"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("p_micros")).as("sum_p_micros"))
      .withColumn("avg_p_micros", expr("sum_p_micros div n_bigrams"))
  }

  /** DuckDB mirror of [[score]]: same tokenizer, same bigram
    * enumeration, same integer div (`//`). `docsRel` must expose
    * (doc_id, t). */
  def scoreSql(docsRel: String): String =
    s"""WITH tl AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '') AS toks
       |  FROM $docsRel),
       |bg AS (
       |  SELECT doc_id, p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS k
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
       |      i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS p
       |    FROM tl WHERE len(toks) >= 2)
       |  GROUP BY 1, 2, 3),
       |bi AS (SELECT a, b, CAST(sum(k) AS BIGINT) AS n_ab FROM bg GROUP BY 1, 2),
       |margin AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM bi GROUP BY 1),
       |vocab AS (
       |  SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
       |  FROM (SELECT unnest(toks) AS t FROM tl)),
       |scored AS (
       |  SELECT bg.doc_id, bg.k,
       |    ((bi.n_ab + 1) * 1000000) // (margin.n_a + vocab.v) AS p_micros
       |  FROM bg JOIN bi USING (a, b) JOIN margin USING (a) CROSS JOIN vocab)
       |SELECT doc_id,
       |  CAST(sum(k) AS BIGINT) AS n_bigrams,
       |  CAST(sum(k * p_micros) AS BIGINT) AS sum_p_micros,
       |  CAST(sum(k * p_micros) // sum(k) AS BIGINT) AS avg_p_micros
       |FROM scored GROUP BY doc_id""".stripMargin
}
