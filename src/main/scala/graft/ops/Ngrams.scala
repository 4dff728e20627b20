package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared Catalyst construction of space-joined token n-grams — the one
  * place the shingle idiom lives (Dedup's brute-force jaccard and
  * Decontam's overlap grams both build on it; their TOKENIZERS differ
  * on purpose: the dedup family splits on a single space like
  * q12/q13, the text-quality family on `\s+` like q14/q54, and each
  * DuckDB oracle mirrors its own family).
  */
object Ngrams {

  /** Distinct space-joined n-grams of an `array<string>` column; empty
    * array when the document has fewer than n tokens. Pure built-ins
    * (`transform`/`sequence`/`slice`/`concat_ws`) so oracles can
    * re-derive the grams verbatim. */
  def distinct(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
}
