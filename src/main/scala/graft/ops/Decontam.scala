package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share a
  * token n-gram with any document of an evaluation set (the standard
  * n-gram-overlap check of GPT-3 appendix C / PaLM / Llama — public
  * method). A training corpus contaminated with benchmark text
  * inflates downstream eval scores, so pipelines run exactly this join
  * before training.
  *
  * Scale shape: the eval side (benchmarks) is tiny versus the corpus —
  * its distinct grams BROADCAST, so the 100 TB side is a map-side
  * scan → per-doc distinct grams → broadcast-hash semi-join; the only
  * shuffle is the final groupBy over MATCHED pairs (a vanishingly
  * small set). No sort, no full-corpus shuffle, skew-immune.
  *
  * Gram construction is pure Catalyst (`split`/`transform`/`slice`/
  * `concat_ws` — no UDF), tokenization identical to the text family
  * (split `\s+`, empties removed).
  */
object Decontam {

  /** Distinct token n-grams per row: (keyCol, gram). */
  def distinctGrams(df: DataFrame, keyCol: String, textCol: String, n: Int): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), x => x =!= "")
    df.select(col(keyCol), explode(Ngrams.distinct(toks, n)).as("gram"))
  }

  /** Contaminated (train_id, eval_id, n_shared) pairs: training docs
    * sharing ≥1 distinct n-gram with an eval doc. `eval` rows must not
    * appear in `train` (the caller excludes them — eval members are
    * dropped from the corpus wholesale, not compared to themselves). */
  def contaminationPairs(train: DataFrame, eval: DataFrame,
                         keyCol: String, textCol: String, n: Int): DataFrame = {
    val tg = distinctGrams(train, keyCol, textCol, n)
      .withColumnRenamed(keyCol, "train_id")
    val eg = distinctGrams(eval, keyCol, textCol, n)
      .withColumnRenamed(keyCol, "eval_id")
    tg.join(broadcast(eg), "gram")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
