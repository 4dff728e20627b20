package graft

/** Ad-hoc query timer: Test/runMain graft.QTime <sfDir> <q1> [q2 ...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.job.GraftSession.local()
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"QTIME $name rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
