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
  /** The timed plan, exposed lazily so PlanSpec can gate it (no
    * interpreted ParseUrl on the measured path). */
  def benchDF(spark: SparkSession, pagesPath: String, parts: Int): org.apache.spark.sql.DataFrame =
    ExtractJob.extractDS(ExtractJob.readPages(spark, pagesPath))
      .repartition(parts, ExtractJob.clusterKey(8))
      .agg(count(lit(1)), sum(length(col("extracted_text"))),
        sum(when(col("error").isNotNull, 1L).otherwise(0L)))

  def runOnce(spark: SparkSession, pagesPath: String, parts: Int): (Long, Double) = {
    val t0 = System.nanoTime()
    val out = benchDF(spark, pagesPath, parts).first()
    val secs = (System.nanoTime() - t0) / 1e9
    (out.getLong(0), secs)
  }

  /** Pure-CPU calibration job: constant work per task, tasks = 8/core,
    * zero I/O, zero shuffle — its measured N→4N efficiency is the
    * PLATFORM ceiling (VM frequency scaling / hypervisor contention +
    * Spark scheduling), the theoretical value being 1.0. Run through
    * the same scheduler as the real job so the normalization is
    * apples-to-apples. */
  def calibrateOnce(spark: SparkSession, maxCores: Int): Double = {
    import spark.implicits._
    // FIXED total work regardless of session cores (like the real job's
    // fixed input): ideal N→4N efficiency is exactly 1.0
    val tasks = maxCores * 8
    val t0 = System.nanoTime()
    spark.range(0, tasks, 1, tasks).map { i =>
      var x: Long = i
      var k = 0
      while (k < 60000000) { x = x * 6364136223846793005L + 1442695040888963407L; k += 1 }
      x
    }.reduce(_ ^ _)
    (System.nanoTime() - t0) / 1e9
  }

  /** Cheap phase probe: the pure-CPU calibration pair alone (~1 min),
    * printing the platform ceiling for an N→4N pairing WITHOUT paying
    * for a full measured campaign — used to decide whether the VM phase
    * is worth spending a full ScalingBench window on.
    *   runMain graft.job.CalibProbe [n] [reps]
    */
  def calibPair(n: Int, reps: Int): Double = {
    val n4 = n * 4
    var calN = Double.MaxValue; var cal4N = Double.MaxValue
    (1 to reps).foreach { _ =>
      val sN = session(n)
      try { val c = calibrateOnce(sN, n4); if (c < calN) calN = c } finally sN.stop()
      val s4 = session(n4)
      try { val c = calibrateOnce(s4, n4); if (c < cal4N) cal4N = c } finally s4.stop()
    }
    (calN / cal4N) / 4.0
  }

  /** Interleaved best-of measurement: alternating N / 4N runs inside the
    * same wall-clock window decorrelates the two levels from the
    * sandbox VM's noisy phases (observed ±30% on identical busy-loops). */
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000L
    val n = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 5
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

    var tN = Double.MaxValue; var t4N = Double.MaxValue
    var calN = Double.MaxValue; var cal4N = Double.MaxValue
    var rowsN = 0L; var rows4N = 0L
    (1 to reps).foreach { _ =>
      val sN = session(n, splitBytes)
      try {
        val (r, t) = runOnce(sN, pagesPath, n * 2)
        rowsN = r; if (t < tN) tN = t
        val c = calibrateOnce(sN, n4); if (c < calN) calN = c
      } finally sN.stop()
      val s4 = session(n4, splitBytes)
      try {
        val (r, t) = runOnce(s4, pagesPath, n4 * 2)
        rows4N = r; if (t < t4N) t4N = t
        val c = calibrateOnce(s4, n4); if (c < cal4N) cal4N = c
      } finally s4.stop()
    }
    require(rowsN == rows4N, "row counts differ between levels")
    val effN = (tN / t4N) / 4.0
    val calEff = (calN / cal4N) / 4.0
    val normalized = math.min(1.0, effN / calEff)
    val json =
      s"""{"metric":"scaling_efficiency","value":${f"$effN%.3f"},"unit":"ratio",""" +
      s""""rows":$rowsN,"n_cores":$n,"n4_cores":$n4,""" +
      s""""t_n_sec":${f"$tN%.3f"},"t_4n_sec":${f"$t4N%.3f"},""" +
      s""""docs_per_sec_n":${f"${rowsN / tN}%.1f"},"docs_per_sec_4n":${f"${rowsN / t4N}%.1f"},""" +
      s""""platform_ceiling_eff":${f"$calEff%.3f"},"normalized_eff":${f"$normalized%.3f"}}"""
    println(json)
    // persist for BENCH/BASELINE.md (one artifact per pairing; the
    // headline 4->16 additionally refreshes scaling.json)
    val dir = new java.io.File("BENCH")
    dir.mkdirs()
    java.nio.file.Files.writeString(dir.toPath.resolve(s"scaling_${n}_$n4.json"), json + "\n")
    if (n == 4) java.nio.file.Files.writeString(dir.toPath.resolve("scaling.json"), json + "\n")
  }
}

object CalibProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 8
    val reps = if (args.length > 1) args(1).toInt else 2
    val eff = ScalingBench.calibPair(n, reps)
    println(f"""{"metric":"calibration_ceiling","n_cores":$n,"n4_cores":${n * 4},"value":$eff%.3f}""")
  }
}
