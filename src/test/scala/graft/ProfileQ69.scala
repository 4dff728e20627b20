package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profile for q69: Test/runMain graft.ProfileQ69 <sfDir> */
object ProfileQ69 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.job.GraftSession.local()
    graft.queries.GraftQueries.setSf(sfDir)
    import graft.queries.GraftQueries
    // warm the extraction dump
    GraftQueries.queries("q26_lang_id")(spark, sfDir).count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val docs = GraftQueries.queries("q26_lang_id")(spark, sfDir) // placeholder to force init
    docs.count()
    val base = spark.read.parquet(GraftQueries.extractedDumpPath(graft.gen.PageGen.rowsForDir(sfDir)))
      .filter(col("error").isNull && col("payload_kind") === "html")
      .select(expr("cast(regexp_extract(url, '/page/([0-9]+)$', 1) as long)").as("doc_id"),
        col("extracted_text").as("text"))
    val toks = base.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "\\s+"), x => x =!= "")).as("term"))
    time("explode-only")(toks.count())
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    time("tf")(tf.count())
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    time("tf+df")(df.count())
    val j = tf.join(df, "term")
    time("tf-join-df")(j.count())
    val full = graft.ops.Balance.topKPerGroup(j, col("doc_id"), col("term"),
      Seq(col("tf").desc, col("df").asc, col("term").asc), k = 5)
    time("full")(full.count())
    time("full-again")(full.count())
    spark.stop()
  }
}
