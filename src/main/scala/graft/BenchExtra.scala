package graft

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (guide §1): time a SUBSET of
  * SparkEntry.queries under the EXACT session config the frozen
  * [[Bench]] uses (local[cpus], shuffle.partitions=cpus, AQE on,
  * 8 MB scan splits, warmCaches staged untimed), so per-query numbers
  * here are comparable to the driver's bench rows without paying for
  * the full 109-query sweep on every iteration.
  *
  * `runMain graft.BenchExtra <q1,q2,...> [reps] [explainDir]`
  *   - each query is timed `reps` times with the same action the
  *     frozen bench uses (`.count()`); a `noop:` prefix on a name
  *     times the noop-sink write instead (guide §1.4 isolation).
  *   - when `explainDir` is given, each query's
  *     `.explain("formatted")` output is written there as
  *     `<name>.txt` (the plan evidence committed under plans/r06).
  *
  * This main is ADDITIVE tooling for the optimization round —
  * [[Bench]], [[Verify]] and the oracle SQL stay frozen.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 3
    val explainDir = if (args.length > 2) Some(args(2)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
    graft.queries.GraftQueries.setSf(sfDir)
    graft.queries.GraftQueries.pagesPath(spark, sfDir)
    SparkEntry.queries("q18_extract_pages")(spark, "/root/testdata/sf0.01").count()
    graft.queries.GraftQueries.warmCaches(spark, sfDir)

    names.foreach { raw =>
      val noop = raw.startsWith("noop:")
      val name = if (noop) raw.stripPrefix("noop:") else raw
      val fn = SparkEntry.queries(name)
      explainDir.foreach { dir =>
        new java.io.File(dir).mkdirs()
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/$name.txt"), txt)
      }
      (1 to reps).foreach { r =>
        spark.sparkContext.setJobDescription(s"$name rep $r")
        val t0 = System.nanoTime()
        val n =
          if (noop) {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save(); -1L
          } else fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"query":"$raw","rep":$r,"sec":$secs%.3f,"rows":$n}""")
        spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
