package graft
import org.apache.spark.sql.functions._
object Q74Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.job.GraftSession.local()
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
    graft.queries.GraftQueries.setSf("/root/testdata/sf0.1")
    graft.queries.GraftQueries.queries("q18_extract_pages")(spark, "/root/testdata/sf0.1").count()
    val d = spark.read.parquet(graft.queries.GraftQueries.extractedDumpPath(100000))
      .filter(col("error").isNull && col("payload_kind") === "html")
      .select(expr("cast(regexp_extract(url, '/page/([0-9]+)$', 1) as long)").as("doc_id"),
        col("extracted_text").as("text"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    for (rep <- 1 to 2) {
      val occ = graft.ops.LmScore.bigramOccurrences(d, "doc_id", "text")
      time(s"occ explode+count rep$rep") { occ.count() }
      time(s"bi train groupBy rep$rep") {
        occ.groupBy(col("a"), col("b")).agg(count(lit(1))).count()
      }
      time(s"full score rep$rep") {
        graft.ops.LmScore.score(d, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
