package graft

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: `runMain graft.BenchOne <name> <sfDir> [cpus] [reps]`.
  * Dev tool for iterating on one query's plan without paying for the
  * whole bench sweep. Prints one JSON line per rep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val reps = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.GraftQueries.setSf(sfDir)
    graft.queries.GraftQueries.pagesPath(spark, sfDir) // untimed generate
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"query":"$name","rep":$r,"sec":$secs%.3f,"rows":$n}""")
    }
    spark.stop()
  }
}
