package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-balancing operators for training-data pipelines: per-domain
  * quotas and deterministic splits. (No reference analog — the
  * reference processes one document at a time; these are corpus-level
  * operations a 100 TB training-data pipeline needs.)
  */
object Balance {

  /** Exact top-k per group, skew-safe: a single `row_number() OVER
    * (PARTITION BY group)` window funnels each group through one task,
    * and web corpora are zipfian (the test generator's head host alone
    * is ~14% of all rows) — at 10^12 rows that one task is the job.
    * Instead: partial top-k within (group, salt) shards, then final
    * top-k over the ≤ k·salts survivors per group. The overall top-k
    * is a subset of the union of shard top-ks, so the result is
    * EXACTLY the single-window answer (the DuckDB oracle for q52 runs
    * the naive window and must hash-match) — only the heavy sort now
    * runs at shard granularity.
    *
    * `order` must be a total order (break ties on a unique column) or
    * rank assignment is nondeterministic. `saltKey` can be any
    * per-row expression with spread within groups (e.g. the url). */
  def topKPerGroup(df: DataFrame, group: Column, saltKey: Column,
                   order: Seq[Column], k: Int, salts: Int = 8,
                   rankCol: String = "rk"): DataFrame = {
    // rankCol is part of the OUTPUT contract — an input column of the
    // same name would be silently clobbered, so refuse it explicitly;
    // the shard-rank scratch column just dodges collisions by name
    require(!df.columns.contains(rankCol),
      s"topKPerGroup: input already has a '$rankCol' column — pass a different rankCol")
    val shardRk = Iterator.from(0).map(i => s"__shard_rk$i")
      .find(n => !df.columns.contains(n)).get
    val shard = Window.partitionBy(group, pmod(hash(saltKey), lit(salts)))
      .orderBy(order: _*)
    val partial = df.withColumn(shardRk, row_number().over(shard))
      .filter(col(shardRk) <= k)
      .drop(shardRk)
    val fin = Window.partitionBy(group).orderBy(order: _*)
    partial.withColumn(rankCol, row_number().over(fin)).filter(col(rankCol) <= k)
  }

  /** Deterministic, engine-portable train/val/test assignment: buckets
    * by the md5 hex string of the id — lexicographic thresholds on the
    * lowercase hex ('cd' ≈ 80.1%, 'e6' ≈ 89.8%) rather than a
    * hash-to-int conversion, because md5 hex + string comparison are
    * bit-identical across Spark, DuckDB, and any other engine, while
    * integer hashes (murmur3 etc.) are engine-specific. Reassigning a
    * document never depends on corpus membership, so splits are stable
    * under incremental ingestion — the property a reproducible
    * training pipeline actually needs. */
  def splitAssign(id: Column): Column = {
    val h = md5(id.cast("string"))
    when(h < lit("cd"), "train").when(h < lit("e6"), "val").otherwise("test")
  }

  /** Deterministic mixture resampling: per-group keep rates (the
    * domain/language reweighting every LLM data pipeline applies when
    * composing a training mix — public method, e.g. the per-source
    * sampling weights of GPT-3 appendix A / The Pile §1). A row is
    * kept iff the first 6 md5-hex digits of its id fall below the
    * group's rate threshold — the same engine-portable hex-threshold
    * trick as [[splitAssign]], so membership is a pure function of
    * (id, rate): stable under ingestion, reproducible on any engine,
    * zero shuffle (the decision is map-side; only the caller's
    * aggregation shuffles).
    *
    * Thresholds are precomputed hex literals (floor(rate·16^6) as 6
    * hex digits), so the comparison is string-lexicographic in both
    * Spark and DuckDB with no float arithmetic in either engine. */
  /** rate → 6-hex-digit threshold; rate >= 1 keeps everything ("g"
    * sorts after every hex digit). Shared by the Column and SQL
    * renderings so they cannot diverge. */
  private def hex6(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0, (rate * 0x1000000L).toLong)}%06x"

  def mixtureKeep(id: Column, group: Column,
                  rates: Seq[(String, Double)], defaultRate: Double): Column = {
    val h6 = substring(md5(id.cast("string")), 1, 6)
    val thr = rates.foldLeft(when(lit(false), lit("")): Column) {
      case (c, (g, r)) => c.when(group === g, lit(hex6(r)))
    }.otherwise(lit(hex6(defaultRate)))
    h6 < thr
  }

  /** DuckDB mirror of [[mixtureKeep]] as a boolean SQL expression,
    * rendered from the SAME rate table + hex-threshold function. */
  def mixtureKeepSql(idExpr: String, groupExpr: String,
                     rates: Seq[(String, Double)], defaultRate: Double): String = {
    val cases = rates.map { case (g, r) => s"WHEN '$g' THEN '${hex6(r)}'" }
      .mkString(" ")
    s"substr(md5($idExpr), 1, 6) < (CASE $groupExpr $cases ELSE '${hex6(defaultRate)}' END)"
  }
}
