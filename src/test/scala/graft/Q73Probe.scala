package graft
import org.apache.spark.sql.functions._
object Q73Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.job.GraftSession.local()
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
    graft.queries.GraftQueries.setSf("/root/testdata/sf0.1")
    val docs = graft.queries.GraftQueries.queries("q18_extract_pages")(spark, "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    val d = spark.read.parquet(graft.queries.GraftQueries.extractedDumpPath(100000))
      .filter(col("error").isNull && col("payload_kind") === "html")
      .select(expr("cast(regexp_extract(url, '/page/([0-9]+)$', 1) as long)").as("doc_id"),
        col("extracted_text").as("text"))
    for (rep <- 1 to 2) {
      time(s"tokenize+count rep$rep") {
        d.select(size(filter(split(lower(col("text")), "\\s+"), x => x =!= "")).as("n"))
          .agg(sum("n")).head().getLong(0)
      }
      time(s"spans explode+count rep$rep") {
        graft.ops.SpanDedup.spans(d, "doc_id", "text", 10).count()
      }
      time(s"spans groupBy(h,id) rep$rep") {
        graft.ops.SpanDedup.spans(d, "doc_id", "text", 10)
          .groupBy(col("h"), col("doc_id")).agg(count(lit(1))).count()
      }
      time(s"full summarize rep$rep") {
        graft.ops.SpanDedup.summarize(d, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
