package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed, MERGEABLE Aggregator —
  * the frequent-items member of the sketch family (q53 covers distinct
  * counts via HLL and quantiles via percentile_approx; this covers
  * "which tokens/hosts dominate" without a full groupBy of the key
  * space).
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS'12): with capacity k, every key's estimate ê
  * satisfies  true − N/(k+1) ≤ ê ≤ true  where N is the TOTAL stream
  * length — including across arbitrary merges of partial sketches, so
  * the bound holds at ANY parallelism. Any key with true count >
  * N/(k+1) is guaranteed present in the sketch. Memory is O(k) per
  * partial — the map-side partial aggregation Spark runs for
  * Aggregators makes this a fixed-memory, single-pass, shuffle-light
  * alternative to groupBy(key).count().orderBy(desc).limit(k), whose
  * exact form must shuffle the FULL key space at 100 TB.
  *
  * Determinism note: estimates (not just presence) depend on merge
  * order, so the OUTPUT is the decremented-estimate multiset, which is
  * NOT bit-stable across parallelism — by design this is a bounded-
  * error sketch like q53's, tested against its error bound, not an
  * oracle row.
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    add(b, key, 1L)

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (key, n)) => add(acc, key, n) }

  def finish(r: Map[String, Long]): Map[String, Long] = r

  /** Add `n` occurrences of `key`, keeping ≤ k counters: if the key is
    * tracked or a slot is free, count it; otherwise decrement ALL
    * counters by the overflow amount (the Misra–Gries step, batched:
    * decrementing by min(n, min counter) repeatedly collapses to one
    * pass with the k-th smallest pivot — we use the simple iterated
    * form since n is 1 on the reduce path and counters are few). */
  private def add(b: Map[String, Long], key: String, n: Long): Map[String, Long] = {
    if (n <= 0) return b
    if (b.contains(key)) b.updated(key, b(key) + n)
    else if (b.size < k) b.updated(key, n)
    else {
      // decrement everyone by d = min(n, smallest counter); drop zeros;
      // recurse with the remaining weight (at least one key drops each
      // round, so this terminates in ≤ k rounds)
      val d = math.min(n, b.values.min)
      val dec = b.flatMap { case (key2, c) =>
        if (c - d > 0) Some(key2 -> (c - d)) else None
      }
      add(dec, key, n - d)
    }
  }

  // ExpressionEncoder keeps the buffer inside Tungsten (no Kryo — the
  // repo-wide discipline; map buffers serialize as Catalyst MapData)
  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Driver-side reference stream form (same add rule, sequential). */
  def sequential(keys: Iterator[String], k: Int): Map[String, Long] = {
    val agg = new HeavyHitters(k)
    keys.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }
}
