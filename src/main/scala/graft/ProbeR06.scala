package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 dev profiler (guide §1.4): time isolated SUBPLANS of the
  * slow queries with the noop sink so the expensive stage inside each
  * is identified before restructuring. Not part of the bench contract.
  *
  * `runMain graft.ProbeR06 <probe>[,<probe>...]` with probes:
  *   q74_occ      — bigram explode only
  *   q74_join     — explode + both broadcast joins (no agg)
  *   q74_full     — whole scoring plan
  *   q109_distinct / q109_member / q109_full
  *   q77_verify / q77_cc / q77_full
  *   counts       — corpus cardinalities (tokens, bigrams, tf, vocab)
  */
object ProbeR06 {
  def main(args: Array[String]): Unit = {
    val probes = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
    graft.queries.GraftQueries.setSf(sfDir)
    graft.queries.GraftQueries.pagesPath(spark, sfDir)

    import graft.queries.GraftQueries._

    def time(name: String)(df: => DataFrame): Unit = {
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"""{"probe":"$name","rep":$rep,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      }
    }

    val docs = extractedDocsFor(spark, sfDir)

    probes.foreach {
      case "counts" =>
        val toks = docs.select(explode(graft.ops.TextStats.lowerToks(col("text"))).as("t"))
        println("docs=" + docs.count())
        println("tokens=" + toks.count())
        println("vocab=" + toks.distinct().count())
        println("tf_pairs=" + docs.select(col("doc_id"),
          explode(graft.ops.TextStats.lowerToks(col("text"))).as("t"))
          .groupBy("doc_id", "t").count().count())
        val fps = winnowCached(spark, sfDir)
        println("winnow_fps=" + fps.count())
        println("winnow_distinct=" + fps.select("fp", "doc_id").distinct().count())
        println("sem_pairs=" + spark.read.parquet(
          annDumpPath("semdedup-c16-pairs", graft.gen.PageGen.rowsForDir(sfDir))).count())
      case "q74_toks" =>
        time("q74_toks")(docs.select(col("doc_id"),
          graft.ops.TextStats.lowerToks(col("text")).as("toks")))
      case "q74_agg" =>
        time("q74_agg")(graft.ops.LmScore.bigramOccurrences(docs, "doc_id", "text")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n")))
      case "q74_occ" =>
        time("q74_occ")(graft.ops.LmScore.bigramOccurrences(docs, "doc_id", "text"))
      case "q74_join" =>
        val occ = graft.ops.LmScore.bigramOccurrences(docs, "doc_id", "text")
        val bi = bigramCountsCached(spark, sfDir)
        val margin = bi.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
        val pruned = bi.filter(col("n_ab") >= 5)
        time("q74_join")(occ
          .join(broadcast(pruned), Seq("a", "b"), "left")
          .join(broadcast(margin), Seq("a")))
      case "q74_full" =>
        time("q74_full")(queries("q74_lm_score")(spark, sfDir))
      case "q74_model" =>
        (1 to 3).foreach { rep =>
          val t0 = System.nanoTime()
          val bi = bigramCountsCached(spark, sfDir)
          val m = bi.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a")).collect()
          val p = bi.filter(col("n_ab") >= 5).collect()
          println(f"""{"probe":"q74_model","rep":$rep,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"m":${m.length},"p":${p.length}}""")
        }
      case "q74_count" =>
        // the real consumption shape: count() after the generate
        (1 to 3).foreach { rep =>
          val t0 = System.nanoTime()
          val n = queries("q74_lm_score")(spark, sfDir).count()
          println(f"""{"probe":"q74_count","rep":$rep,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$n}""")
        }
      case "q68_ab" =>
        // interleaved A/B of the round-checkpoint eagerness: old = eager
        // localCheckpoint per round, new = the shipped lazy form
        def ranksEager(edgesIn: DataFrame): DataFrame = {
          import graft.ops.HostRank._
          val edges = edgesIn.select(col("src"), col("dst")).distinct()
            .localCheckpoint(true)
          val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
          val srcSide = edges.join(outdeg, "src").localCheckpoint(true)
          val nodes = edges.select(col("src").as("host"))
            .union(edges.select(col("dst").as("host")))
            .distinct().localCheckpoint(true)
          var rank = nodes.withColumn("rank_micros", lit(InitMicros))
          var t = 0
          while (t < Iters) {
            val contrib = srcSide
              .join(rank.withColumnRenamed("host", "src"), "src")
              .select(col("dst").as("host"),
                expr(s"(rank_micros * $DampNum) div ($DampDen * outdeg)").as("c"))
            rank = nodes
              .join(contrib.groupBy("host").agg(sum("c").as("in_c")), Seq("host"), "left")
              .select(col("host"),
                (lit(BaseMicros) + coalesce(col("in_c"), lit(0L))).as("rank_micros"))
              .localCheckpoint(true)
            t += 1
          }
          rank
        }
        val edges = hostEdgesAll(spark, sfDir).localCheckpoint(true)
        (1 to 4).foreach { rep =>
          var t0 = System.nanoTime()
          val nOld = ranksEager(edges).count()
          val tOld = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          val nNew = graft.ops.HostRank.ranks(edges).count()
          val tNew = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"q68_ab","rep":$rep,"old":$tOld%.3f,"new":$tNew%.3f,"rows":[$nOld,$nNew]}""")
        }
      case "tok_ab" =>
        // native LowerToksWs vs the expression form, interleaved; the
        // count(explode) consumption keeps the array from being
        // optimized away while avoiding noop's row-materialization bias
        (1 to 6).foreach { rep =>
          var t0 = System.nanoTime()
          val nNew = docs.select(explode(
            graft.ops.TextStats.lowerToks(col("text"))).as("t"))
            .groupBy().count().collect()(0).getLong(0)
          val tNew = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          val nOld = docs.select(explode(
            graft.ops.TextStats.lowerToksExprForm(col("text"))).as("t"))
            .groupBy().count().collect()(0).getLong(0)
          val tOld = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"tok_ab","rep":$rep,"old":$tOld%.3f,"new":$tNew%.3f,"toks":[$nOld,$nNew]}""")
        }
      case "q90_ab" =>
        // eager-l1norm HITS (pre-r6b) vs the shipped lazy form
        def scoresEager(edgesIn: DataFrame): DataFrame = {
          import graft.ops.Hits._
          def l1normE(df: DataFrame): DataFrame = {
            val m = df.localCheckpoint(true)
            val tot = m.agg(greatest(expr(s"sum(v) div $Scale"), lit(1L)).as("nrm"))
            m.crossJoin(broadcast(tot))
              .select(col("host"), expr("v div nrm").as("v"))
          }
          def halfStepE(edges: DataFrame, nodes: DataFrame,
              scores: DataFrame, from: String, to: String): DataFrame =
            l1normE(graft.ops.Hits.propagate(edges, nodes, scores, from, to))
          val edges = edgesIn.select(col("src"), col("dst")).distinct()
            .localCheckpoint(true)
          val nodes = edges.select(col("src").as("host"))
            .union(edges.select(col("dst").as("host")))
            .distinct().localCheckpoint(true)
          var hub = nodes.withColumn("v", lit(Scale))
          var auth = nodes.withColumn("v", lit(0L))
          var t = 0
          while (t < Iters) {
            auth = halfStepE(edges, nodes, hub, "src", "dst").localCheckpoint(false)
            hub = halfStepE(edges, nodes, auth, "dst", "src").localCheckpoint(false)
            t += 1
          }
          nodes
            .join(auth.withColumnRenamed("v", "auth_micros"), "host")
            .join(hub.withColumnRenamed("v", "hub_micros"), "host")
            .select(col("host"), col("auth_micros"), col("hub_micros"))
        }
        val he = hostEdgesAll(spark, sfDir).localCheckpoint(true)
        (1 to 5).foreach { rep =>
          var t0 = System.nanoTime()
          val nOld = scoresEager(he).count()
          val tOld = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          val nNew = graft.ops.Hits.scores(he).count()
          val tNew = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"q90_ab","rep":$rep,"old":$tOld%.3f,"new":$tNew%.3f,"rows":[$nOld,$nNew]}""")
        }
      case "q109_ab" =>
        import graft.ops.Winnowing.{BucketCap, MinShared}
        def pairsOld(fps: DataFrame): DataFrame = {
          val byFp = fps.select(col("fp"), col("doc_id")).distinct()
          val kept = byFp
            .groupBy(col("fp")).agg(count(lit(1)).as("n"))
            .filter(col("n") <= BucketCap)
            .select(col("fp"))
          val member = byFp.join(kept, Seq("fp"), "left_semi")
          member.groupBy(col("fp"))
            .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
            .filter(size(col("ds")) >= 2)
            .select(explode(expr(
              "flatten(transform(sequence(0, size(ds) - 2), i -> " +
                "transform(sequence(i + 1, size(ds) - 1), j -> " +
                "named_struct('doc_a', ds[i], 'doc_b', ds[j]))))")).as("p"))
            .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(count(lit(1)).as("n_shared"))
            .filter(col("n_shared") >= MinShared)
        }
        val fps = winnowCached(spark, sfDir)
        (1 to 5).foreach { rep =>
          var t0 = System.nanoTime()
          val nOld = pairsOld(fps).count()
          val tOld = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          val nNew = graft.ops.Winnowing.pairs(fps).count()
          val tNew = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"q109_ab","rep":$rep,"old":$tOld%.3f,"new":$tNew%.3f,"rows":[$nOld,$nNew]}""")
        }
      case "q74_old" =>
        // the pre-r6 join-form scoring plan, for A/B
        val occ = graft.ops.LmScore.bigramOccurrences(docs, "doc_id", "text")
        val bi = bigramCountsCached(spark, sfDir)
        val margin = bi.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
        val pruned = bi.filter(col("n_ab") >= 5)
        val vocab = margin.agg(count(lit(1)).as("v"))
        (1 to 3).foreach { rep =>
          val t0 = System.nanoTime()
          val n = occ
            .join(broadcast(pruned), Seq("a", "b"), "left")
            .join(broadcast(margin), Seq("a"))
            .crossJoin(broadcast(vocab))
            .withColumn("p_micros",
              expr("((coalesce(n_ab, 0) + 1) * 1000000) div (n_a + v)"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_bigrams"),
              sum(col("p_micros")).as("sum_p_micros"))
            .withColumn("avg_p_micros", expr("sum_p_micros div n_bigrams"))
            .count()
          println(f"""{"probe":"q74_old","rep":$rep,"sec":${(System.nanoTime() - t0) / 1e9}%.3f,"rows":$n}""")
        }
      case "q109_distinct" =>
        time("q109_distinct")(
          winnowCached(spark, sfDir).select(col("fp"), col("doc_id")).distinct())
      case "q109_member" =>
        val byFp = winnowCached(spark, sfDir).select(col("fp"), col("doc_id")).distinct()
        val kept = byFp.groupBy(col("fp")).agg(count(lit(1)).as("n"))
          .filter(col("n") <= 64).select(col("fp"))
        time("q109_member")(byFp.join(kept, Seq("fp"), "left_semi"))
      case "q109_full" =>
        time("q109_full")(queries("q109_winnowing")(spark, sfDir))
      case "q77_verify" =>
        val rows = graft.gen.PageGen.rowsForDir(sfDir)
        val pairs = spark.read.parquet(annDumpPath("semdedup-c16-pairs", rows))
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id").cast("string").as("id"), col("embedding"))
        time("q77_verify")(pairs
          .join(e.select(col("id").as("a_id"), col("embedding").as("a_vec")), "a_id")
          .join(e.select(col("id").as("b_id"), col("embedding").as("b_vec")), "b_id")
          .filter(graft.ops.Similarity.cosine(col("a_vec"), col("b_vec")) >= 0.35)
          .select(col("a_id"), col("b_id")))
      case "q77_full" =>
        time("q77_full")(queries("q77_semantic_dedup")(spark, sfDir))
      case other =>
        System.err.println(s"unknown probe $other")
    }
    spark.stop()
  }
}
