package graft.job

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism-level scaling harness — the in-sandbox evidence for
  * the north rule's "N → 4N executors with throughput scaling
  * efficiency ≥ 0.8" (no real cluster here; the stand-in pinned by
  * BASELINE.md is the same job at local[N] vs local[4N] on identical
  * input).
  *
  * Protocol: one pages table generated once; per level we build a fresh
  * SparkSession (master=local[N]), run the full extraction pipeline
  * (scan → salted repartition → mapPartitions extract → aggregate
  * checksum), take the best of `reps` runs (JIT-warmed), and report
  * docs/sec at both levels plus efficiency = (T_N / T_4N) / 4.
  *
  *   runMain graft.job.ScalingBench [rows] [n] [reps]   (4N = 4*n)
  */
object ScalingBench {

  def session(cores: Int, splitBytes: Long = 0): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (splitBytes > 0) b.config("spark.sql.files.maxPartitionBytes", splitBytes.toString)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Split size targeting ~tasksPerCore waves on the 4N level — the
    * CPU-bound-scan tuning the 100 TB story depends on (at full scale
    * the default 128 MB gives ~800k splits and this knob is moot). */
  def splitBytesFor(pagesPath: String, maxCores: Int, tasksPerCore: Int = 4): Long = {
    val dir = new java.io.File(pagesPath)
    val total = Option(dir.listFiles()).map(_.filter(_.getName.endsWith(".parquet")).map(_.length()).sum).getOrElse(0L)
    math.max(1L << 20, total / (maxCores.toLong * tasksPerCore))
  }

  /** The measured job: the run() pipeline minus the disk write —
    * extraction on scan splits, salted-host repartition of the
    * (text-only) output, checksum aggregation forcing every byte. */
  def runOnce(spark: SparkSession, pagesPath: String, parts: Int): (Long, Double) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val out = ExtractJob.extractDS(ExtractJob.readPages(spark, pagesPath))
      .repartition(parts, expr("concat(parse_url(url, 'HOST'), '#', pmod(hash(url), 8))"))
      .agg(count(lit(1)), sum(length(col("extracted_text"))),
        sum(when(col("error").isNotNull, 1L).otherwise(0L)))
      .first()
    val secs = (System.nanoTime() - t0) / 1e9
    (out.getLong(0), secs)
  }

  def measure(cores: Int, pagesPath: String, reps: Int, splitBytes: Long): (Long, Double) = {
    val spark = session(cores, splitBytes)
    try {
      var best = Double.MaxValue
      var rows = 0L
      (1 to reps).foreach { _ =>
        val (n, secs) = runOnce(spark, pagesPath, cores * 2)
        rows = n
        if (secs < best) best = secs
      }
      (rows, best)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000L
    val n = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val n4 = n * 4
    val pagesPath = s"/tmp/graft_pages_cache/g${graft.gen.PageGen.GenVersion}-rows$rows"

    // generate once (untimed)
    if (!new java.io.File(s"$pagesPath/_SUCCESS").exists()) {
      val s = session(n4)
      ExtractJob.generatePages(s, rows, pagesPath)
      s.stop()
    }
    val splitBytes = splitBytesFor(pagesPath, n4)
    // warmup JVM/JIT on a slice (untimed, separate session)
    val w = session(n, splitBytes)
    try runOnce(w, pagesPath, n * 2) finally w.stop()

    val (rowsN, tN) = measure(n, pagesPath, reps, splitBytes)
    val (rows4N, t4N) = measure(n4, pagesPath, reps, splitBytes)
    require(rowsN == rows4N, "row counts differ between levels")
    val effN = (tN / t4N) / 4.0
    val json =
      s"""{"metric":"scaling_efficiency","value":${f"$effN%.3f"},"unit":"ratio",""" +
      s""""rows":$rowsN,"n_cores":$n,"n4_cores":$n4,""" +
      s""""t_n_sec":${f"$tN%.3f"},"t_4n_sec":${f"$t4N%.3f"},""" +
      s""""docs_per_sec_n":${f"${rowsN / tN}%.1f"},"docs_per_sec_4n":${f"${rowsN / t4N}%.1f"}}"""
    println(json)
    // persist for BENCH/BASELINE.md
    val dir = new java.io.File("BENCH")
    dir.mkdirs()
    java.nio.file.Files.writeString(dir.toPath.resolve("scaling.json"), json + "\n")
  }
}
