package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full HTML/PDF extraction over the synthesized pages table
    * at sf0.001 scale; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.GraftQueries.queries("q18_extract_pages")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraftQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.GraftQueries.oracleSql
}
