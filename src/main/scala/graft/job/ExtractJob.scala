package graft.job

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Extract, ExtractedDoc, ExtractionVersion, Page}
import graft.gen.PageGen

/** The main extraction pipeline — the Spark-native re-expression of the
  * reference's whole Celery chain
  * (/root/reference/ocrworker/tasks.py:69-89:
  * `chain(group(pages) | stitch | update_db | notify)`), collapsed into
  * one Catalyst plan:
  *
  *   scan pages
  *     → resume anti-join vs committed urls        (S7: skip-if-done,
  *         /root/reference/ocrworker/s3.py:128-159)
  *     → salted repartition over skewed hosts      (north rule; the queue
  *         load-balanced implicitly, tasks.py:57-68 — we must be explicit)
  *     → mapPartitions(Extract)                    (steps 4-6: per-page OCR
  *         + ordered stitch, ocr.py:9-67 + utils.py:30-48)
  *     → write snapshot data + manifest commit     (step 7: the DB txn,
  *         db/api.py:112-161)
  *
  * Scale notes (100 TB / 10^12 rows): the html payload column never
  * crosses a shuffle — extraction happens map-side and projects the
  * binary away before any exchange; the only shuffles are the resume
  * anti-join (broadcast when the committed set is small, AQE otherwise)
  * and the explicit salted repartition, whose width is a parameter.
  * Extraction is embarrassingly parallel, so throughput scales with
  * cores until the scan is I/O-bound.
  */
object ExtractJob {

  /** Read the input table as the typed Dataset pinned by input_hint. */
  def readPages(spark: SparkSession, path: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("url", "warc_ts", "html", "text", "lang")
      .as[Page]
  }

  /** The extraction stage alone (no snapshot I/O) — reused by tests,
    * SparkEntry queries, and the bench. One partition-scoped pass; the
    * per-partition init is the analog of the reference's cached engine
    * instances (/root/reference/ocrworker/engines/factory.py:9-13). */
  def extractDS(pages: Dataset[Page]): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it => it.map(Extract(_)) }
  }

  /** Extraction with the task's partition id attached (lineage). */
  private final case class WithPid(doc: ExtractedDoc, partition_id: Int)

  def run(
      spark: SparkSession,
      pagesPath: String,
      outRoot: String,
      numPartitions: Int = 0,
      saltBuckets: Int = 8): Snapshot = {
    import spark.implicits._

    val pages = readPages(spark, pagesPath)

    // ---- resume anti-join (S7): skip urls already committed ----------
    val committedDirs = SnapshotStore.dataDirs(outRoot)
    val pending: Dataset[Page] =
      if (committedDirs.isEmpty) pages
      else {
        val committed = spark.read.parquet(committedDirs: _*).select("url")
        pages.join(committed, Seq("url"), "left_anti").as[Page]
      }

    // ---- explicit partitioning with host salting ----------------------
    // Hosts are zipfian (a few own ~30% of rows). Partitioning by host
    // alone would melt a few tasks at 10^12 rows; salting by a hash of
    // the full url within host spreads each hot host over `saltBuckets`
    // partitions while keeping host-locality for downstream per-host
    // metrics. AQE (enabled in session conf) re-splits any residue.
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism * 2
    val salted = pending
      .repartition(parts, expr(s"concat(parse_url(url, 'HOST'), '#', pmod(hash(url), $saltBuckets))"))
      .as[Page]

    // ---- extraction (map-side; html never crosses a shuffle) ----------
    val extracted = salted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      it.map(p => WithPid(Extract(p), pid))
    }

    val (seq, dataDir) = SnapshotStore.nextDataDir(outRoot)
    extracted
      .select($"doc.*", $"partition_id")
      .write.mode(SaveMode.Overwrite).parquet(dataDir)

    // ---- lineage from the written snapshot (post-write scan is cheap:
    // output carries text only, the binary column is long gone) --------
    val lineageRows = spark.read.parquet(dataDir)
      .groupBy($"partition_id")
      .agg(
        count(lit(1)).as("row_count"),
        sum(when($"error".isNotNull, 1L).otherwise(0L)).as("error_count"),
        min(unix_millis($"warc_ts")).as("ts_min"),
        max(unix_millis($"warc_ts")).as("ts_max"))
      .collect()
      .map(r => PartitionLineage(
        r.getAs[Int]("partition_id"), r.getAs[Long]("row_count"),
        r.getAs[Long]("error_count"), r.getAs[Long]("ts_min"), r.getAs[Long]("ts_max")))
      .toSeq

    val snap = Snapshot(
      sequence = seq,
      parent = seq - 1,
      extractionVersion = ExtractionVersion.current,
      dataDir = dataDir,
      partitions = lineageRows.sortBy(_.partitionId),
      rowCount = lineageRows.map(_.rowCount).sum)
    SnapshotStore.commit(outRoot, snap)
    snap
  }

  /** Read the union of all committed snapshots (the logical table). */
  def readExtracted(spark: SparkSession, outRoot: String): DataFrame = {
    val dirs = SnapshotStore.dataDirs(outRoot)
    require(dirs.nonEmpty, s"no snapshots at $outRoot")
    spark.read.parquet(dirs: _*)
  }

  /** Generate the deterministic synthetic pages table (distributed:
    * each row is a pure function of (seed, index)). */
  def generatePages(spark: SparkSession, rows: Long, path: String,
                    seed: Long = PageGen.DefaultSeed, partitions: Int = 0): Unit = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, rows, 1, parts)
      .mapPartitions(_.map(i => PageGen.genRow(seed, i).page))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

/** spark-submit entry point (the analog of the reference CLI,
  * /root/reference/ocrworker/cli/ocr.py:12-33):
  *   runMain graft.job.ExtractCli <pagesParquet> <outRoot> [numPartitions]
  */
object ExtractCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExtractCli <pagesParquet> <outRoot> [numPartitions]")
    val spark = GraftSession.local()
    val parts = if (args.length > 2) args(2).toInt else 0
    val snap = ExtractJob.run(spark, args(0), args(1), numPartitions = parts)
    println(s"committed snapshot seq=${snap.sequence} rows=${snap.rowCount} " +
      s"errors=${snap.partitions.map(_.errorCount).sum} partitions=${snap.partitions.size}")
    println(SnapshotStore.readManifest(args(1), snap.sequence))
    spark.stop()
  }
}

/** Generator entry point:
  *   runMain graft.job.GenCli <rows> <outPath>
  */
object GenCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenCli <rows> <outPath>")
    val spark = GraftSession.local()
    ExtractJob.generatePages(spark, args(0).toLong, args(1))
    println(s"generated ${args(0)} pages at ${args(1)}")
    spark.stop()
  }
}

object GraftSession {
  /** Session defaults shared by all entry points: AQE on (skew-join +
    * partition coalescing), shuffle width = cores, UTC. */
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
