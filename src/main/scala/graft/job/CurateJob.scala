package graft.job

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Balance, Dedup, Hosts, Repetition, TextStats}

/** End-to-end corpus curation as a RUNNABLE JOB — the stage a training
  * pipeline schedules after extraction, composing operators that are
  * each oracle-backed on the query surface into one dataset build:
  *
  *   extraction snapshots (ExtractJob/SnapshotStore output)
  *     → mojibake repair rung          q108 kernel (Mojibake.repair),
  *                                     on by default: the ftfy pass
  *                                     runs BEFORE dedup so a clean doc
  *                                     and its upstream-mangled twin
  *                                     share one digest (mojibake
  *                                     otherwise defeats exact dedup);
  *                                     map-side, a no-op on clean text
  *     → url blocklist/score rung      q80 kernel (UrlFilter), optional:
  *                                     the RefinedWeb FIRST stage — the
  *                                     cheapest signal drops docs before
  *                                     any content-sized work
  *     → exact content dedup           q12 rule: min-url keeper per md5
  *     → fuzzy (MinHash) dedup         q20 LSH pairs + q47 components,
  *                                     keep each cluster's canonical
  *     → semantic (SemDeDup) dedup     q77 kernel (Similarity
  *                                     .semanticDedup), optional: runs
  *                                     when an embeddings table is
  *                                     supplied — the RefinedWeb →
  *                                     SemDeDup recipe's last rung
  *     → Gopher/C4 repetition gate     q54 thresholds (Repetition.keep)
  *     → corpus-median quality gate    q50 shape: percentile aggregate
  *                                     broadcast back, never a global sort
  *     → per-host cap                  q52 shape: salted two-phase exact
  *                                     top-k (zipfian head hosts spread)
  *     → train/val/test assignment     q51 rule: md5-hex buckets, stable
  *                                     under incremental ingestion
  *     → curated parquet, partitioned by split, + a funnel manifest
  *
  * Scale notes: document text crosses the wire exactly twice — once
  * into the dedup keeper semi-join (keyed by digest, the text rides
  * only until the projection) and once into the host-cap exchange —
  * and the quality threshold is a broadcast scalar. The funnel counts
  * are per-stage aggregates over a persisted feature table (at
  * 10^12 rows you would swap the persist for accumulators riding the
  * write; counted explicitly here because the funnel IS the lineage
  * record a curation run must publish). */
object CurateJob {

  final case class Funnel(
      extracted: Long,  // rows in the extraction table
      html: Long,       // clean html docs entering curation
      mojibakeRepaired: Long, // docs the ftfy rung transformed (0 on a
                              // clean corpus; repair never drops rows)
      urlFiltered: Long, // after the url blocklist/score rung (== html
                         // when no blocklist was supplied)
      deduped: Long,    // after exact content dedup
      fuzzyDeduped: Long, // after MinHash near-dup clustering (keep-one)
      semanticDeduped: Long, // after embedding-level SemDeDup (== fuzzyDeduped
                             // when no embeddings table was supplied)
      gated: Long,      // after repetition + quality gates
      kept: Long)       // after the per-host cap == curated rows

  /** @param embeddings optional (url, embedding ARRAY<FLOAT>) table —
    *   when present, the modern recipe's final dedup rung runs after
    *   lexical MinHash (RefinedWeb → SemDeDup, round-4 VERDICT #5):
    *   embedding-cluster-scoped cosine components, keep the member
    *   farthest from its cell centroid. Docs WITHOUT an embedding pass
    *   through untouched (dedup what you can measure — at production
    *   scale the embedding table lags the crawl by one model pass). */
  /** @param urlBlocklist optional domain blocklist — when present, the
    *   RefinedWeb FIRST rung runs before any content work: docs whose
    *   host is (a subdomain of) a listed domain, or whose url trips the
    *   word/structure score, are dropped map-side (ops.UrlFilter, the
    *   q80 kernel). None keeps the stage out of the funnel (the q57
    *   oracle mirrors the blocklist-free chain). */
  def run(spark: SparkSession, extractRoot: String, outRoot: String,
          perHostCap: Int = 1000, fuzzyThreshold: Double = 0.6,
          embeddings: Option[org.apache.spark.sql.DataFrame] = None,
          semThreshold: Double = 0.9, semCells: Int = 16,
          urlBlocklist: Option[Seq[String]] = None,
          repairMojibake: Boolean = true): Funnel = {
    val table = ExtractJob.readExtracted(spark, extractRoot)
    val baseRaw = table
      .filter(col("error").isNull && col("payload_kind") === "html" &&
        length(col("extracted_text")) > 0)
      .select(col("url"), col("extracted_text"))

    // ftfy rung FIRST (q108 kernel): mojibake defeats every digest
    // downstream — a mangled twin of a clean doc would survive exact
    // dedup, land in different LSH buckets, and double-count its host.
    // Map-side, no rows dropped, a no-op wherever the signature is
    // absent; the funnel records how many docs were transformed.
    val base0 =
      if (repairMojibake)
        baseRaw.withColumn("extracted_text",
          graft.ops.Mojibake.repair(col("extracted_text")))
      else baseRaw

    // url rung (first DROPPING stage, like the published recipes: the
    // cheapest signal drops payload before any content-sized work)
    val base = urlBlocklist match {
      case Some(bl) =>
        graft.ops.UrlFilter.verdicts(base0, "url", bl)
          .filter(!col("blocked"))
          .select(col("url"), col("extracted_text"))
      case None => base0
    }

    // url uniqueness first: the snapshot chain anti-joins urls ACROSS
    // snapshots, but a url re-crawled with changed content within one
    // ingestion batch would otherwise survive dedup twice (two digests,
    // same min url) and break the host cap's total order. Identical
    // re-crawl rows collapse; among differing texts the min-digest row
    // wins — deterministic.
    val rows = base.dropDuplicates("url", "extracted_text")
      .withColumn("h", md5(col("extracted_text")))
    val urlKeeper = rows.groupBy(col("url")).agg(min(col("h")).as("h"))
    val perUrl = rows.join(urlKeeper, Seq("url", "h"), "left_semi")
    // exact content dedup — THE q12 rule via its one home (Dedup.exact):
    // one keeper per content digest, the lexicographic-min url
    val keeper = Dedup.exact(perUrl, idCol = "url", textCol = "extracted_text")
      .select(col("text_hash").as("h"), col("keep_id").as("url"))
    // persisted: the fuzzy stage references this table five times
    // (banding, the verify joins, the cluster docs, the keep semi-join)
    // and the funnel counts it — unpersisted, its scan+dedup lineage
    // would re-execute each time
    val deduped = perUrl.join(keeper, Seq("h", "url"), "left_semi").drop("h")
      .persist()

    // fuzzy (near-dup) dedup — the stage every modern recipe runs after
    // exact dedup (C4/RefinedWeb/Gopher all MinHash here): LSH-blocked
    // verified pairs → connected components → keep each cluster's
    // canonical member (the q20 + q47 kernels, unchanged). The LSH
    // bucket cap is AUDITED, never silent (the house rule): the dropped
    // count goes into the funnel manifest.
    val bands = Dedup.minhashBands(deduped, "url", "extracted_text", shingleN = 2)
    val fuzzyBucketsDropped = Dedup.oversizedBuckets(bands)
    val pairs = Dedup.jaccardVerify(Dedup.candidatePairs(bands), deduped,
      "url", "extracted_text", shingleN = 2, threshold = fuzzyThreshold)
    val canon = Dedup.dedupClusters(deduped, pairs, idCol = "url")
      .filter(col("is_canonical"))
      .select(col("doc_id").as("url"))
    val fuzzyDeduped = deduped.join(canon, Seq("url"), "left_semi")
      .persist()

    // embedding-level dedup (SemDeDup) — the recipe's last rung, scoped
    // to docs that (a) survived lexical dedup and (b) HAVE an embedding
    val semDeduped = embeddings match {
      case Some(emb) =>
        val scoped = emb
          .select(col("url"), col("embedding"))
          .join(fuzzyDeduped.select("url"), Seq("url"), "left_semi")
        val keep = graft.ops.Similarity
          .semanticDedup(scoped, "url", "embedding",
            nCells = semCells, threshold = semThreshold)
          .filter(col("is_canonical"))
          .select(col("id").as("url"))
        val withEmb = fuzzyDeduped.join(keep, Seq("url"), "left_semi")
        val withoutEmb = fuzzyDeduped
          .join(emb.select("url"), Seq("url"), "left_anti")
        withEmb.unionByName(withoutEmb)
      case None => fuzzyDeduped
    }

    // per-doc features once; both gates and the funnel read this table
    val feats = Repetition.withStats(semDeduped, textCol = "extracted_text")
      .withColumn("quality", TextStats.qualityScore(col("extracted_text")))
      .persist()
    try {
      val kept = feats.filter(col("keep"))
      // exact percentile (the oracle-proven q50 shape, and exact so the
      // job is bit-deterministic); its buffer is value-count-sized — at
      // 10^12 rows swap for a fixed-memory quantile sketch and accept
      // an approximate threshold (approx_percentile's merge order would
      // cost the determinism contract here)
      val thr = kept.agg(expr("percentile(quality, 0.5)").as("q50"))
      val gated = kept.join(broadcast(thr))
        .filter(col("quality") >= col("q50"))
        .withColumn("host", Hosts.hostOf(col("url")))
      val capped = Balance.topKPerGroup(gated, col("host"), col("url"),
        Seq(col("quality").desc, col("url").asc), k = perHostCap)
      val curated = capped
        .select(col("url"), col("host"), col("quality"),
          Balance.splitAssign(col("url")).as("split"), col("extracted_text"))
      curated.write.mode(SaveMode.Overwrite).partitionBy("split")
        .parquet(s"$outRoot/data")

      // an all-filtered corpus writes ZERO part files — reading the dir
      // back would fail schema inference, so count the written rows
      // only when something was written (a legal outcome: e.g. every
      // doc failed the repetition gate)
      val wroteFiles = Option(new java.io.File(s"$outRoot/data").listFiles())
        .getOrElse(Array.empty)
        .exists(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      // html + mojibake counts in ONE pass over the raw base (repair
      // drops no rows, so html == |baseRaw|; a second corpus-sized
      // scan purely for the repair stat would be waste)
      val htmlStats = baseRaw.agg(
        count(lit(1)).as("n_html"),
        (if (repairMojibake)
           coalesce(  // sum over zero rows is NULL, not 0
             sum(when(graft.ops.Mojibake.wouldRepair(col("extracted_text")),
               1L).otherwise(0L)), lit(0L))
         else lit(0L)).as("n_moji")).first()
      val funnel = Funnel(
        extracted = table.count(),
        html = htmlStats.getLong(0),
        mojibakeRepaired = htmlStats.getLong(1),
        urlFiltered =
          if (urlBlocklist.isDefined) base.count() else htmlStats.getLong(0),
        deduped = deduped.count(),
        fuzzyDeduped = fuzzyDeduped.count(),
        semanticDeduped = feats.count(),
        gated = gated.count(),
        kept = if (wroteFiles) spark.read.parquet(s"$outRoot/data").count() else 0L)
      val json =
        s"""{"extracted":${funnel.extracted},"html":${funnel.html},"mojibake_repaired":${funnel.mojibakeRepaired},"url_filtered":${funnel.urlFiltered},"deduped":${funnel.deduped},"fuzzy_deduped":${funnel.fuzzyDeduped},"semantic_deduped":${funnel.semanticDeduped},"gated":${funnel.gated},"kept":${funnel.kept},"per_host_cap":$perHostCap,"fuzzy_buckets_dropped":$fuzzyBucketsDropped}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outRoot))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outRoot, "funnel.json"), json + "\n")
      funnel
    } finally {
      feats.unpersist(blocking = false)
      fuzzyDeduped.unpersist(blocking = false)
      deduped.unpersist(blocking = false): Unit
    }
  }
}

/** Curation entry point:
  *   runMain graft.job.CurateCli <extractRoot> <curatedRoot> [perHostCap]
  */
object CurateCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateCli <extractRoot> <curatedRoot> [perHostCap]")
    val spark = GraftSession.local()
    val cap = if (args.length > 2) args(2).toInt else 1000
    val f = CurateJob.run(spark, args(0), args(1), cap)
    println(s"curated ${f.kept} docs (extracted=${f.extracted} html=${f.html} " +
      s"urlFiltered=${f.urlFiltered} deduped=${f.deduped} fuzzy=${f.fuzzyDeduped} " +
      s"semantic=${f.semanticDeduped} gated=${f.gated}) at ${args(1)}")
    spark.stop()
  }
}
