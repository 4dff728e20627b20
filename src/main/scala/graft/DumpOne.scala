package graft

import org.apache.spark.sql.SparkSession

/** Dump a single SparkEntry query + its oracle SQL for a focused
  * check_oracle.py run: `runMain graft.DumpOne <name> <sfDir> <outDir>`.
  * Dev tool — the driver's gate runs the full [[Verify]]. */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.GraftQueries.setSf(sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = SparkEntry.oracleSql.get(name)
      .map(s => s"{${q(name)}: ${q(s)}}").getOrElse("{}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), sql)
    spark.stop()
  }
}
