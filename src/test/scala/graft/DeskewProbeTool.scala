package graft

/** Out-of-suite probe for the deskew kernel's recovery margin.
  *
  * No args: quick sweep — every planted angle over a 20-page sample,
  * prints the worst |median − planted| (the q79 oracle gate is 50
  * centi-degrees).
  *
  * `full <rows>`: replays the ENTIRE generated corpus slice the q79
  * dump will see (same seed, same planted-angle function), in parallel,
  * and prints every page whose recovered median misses the 0.5° gate —
  * run before trusting the oracle's recovered_ok=TRUE assertion at a
  * new scale factor.
  */
object DeskewProbeTool {
  private def median(a: Array[Int]): Double = {
    val s = a.sorted
    if (s.length % 2 == 1) s(s.length / 2).toDouble
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("full")) { fullCorpus(args(1).toInt); return }
    val texts = (0 until 8000).iterator
      .map(i => graft.gen.PageGen.genRow(42L, i.toLong))
      .filter(_.kind == "pdf")
      .take(12)
      .flatMap(g => graft.pdf.PdfParser.extract(g.page.html).toOption.get.pageTexts)
      .take(20).toSeq
    var worst = 0.0
    for (planted <- (-1400 to 1400 by 100) :+ 2200; t <- texts) {
      val bmp = graft.pdf.PageRaster.rasterizeSkewed(t, planted)
      val ls = graft.pdf.Deskew.lines(bmp)
      if (ls.nonEmpty) {
        val med = median(ls.map(_.angleCenti))
        val err = math.abs(med - planted)
        if (err > worst) { worst = err; println(f"WORSTSOFAR planted=$planted%5d nLines=${ls.length}%2d med=$med%8.1f err=$err%6.1f") }
      } else println(s"EMPTY planted=$planted")
    }
    println(f"FINALWORST $worst%.1f")
  }

  private def fullCorpus(rows: Int): Unit = {
    val bad = new java.util.concurrent.atomic.AtomicInteger(0)
    val pages = new java.util.concurrent.atomic.AtomicInteger(0)
    val worst = new java.util.concurrent.atomic.AtomicLong(0L) // centi*10
    java.util.stream.IntStream.range(0, rows).parallel().forEach { i =>
      val g = graft.gen.PageGen.genRow(graft.gen.PageGen.DefaultSeed, i.toLong)
      if (g.kind == "pdf") {
        val planted = graft.queries.GraftQueries.plantedSkewCenti(i.toLong)
        graft.pdf.PdfParser.extract(g.page.html).toOption.foreach { res =>
          res.pageTexts.zipWithIndex.foreach { case (t, p) =>
            val ls = graft.pdf.Deskew.lines(
              graft.pdf.PageRaster.rasterizeSkewed(t, planted))
            if (ls.nonEmpty) {
              pages.incrementAndGet()
              val med = median(ls.map(_.angleCenti))
              val err = math.abs(med - planted)
              worst.accumulateAndGet(math.round(err * 10), Math.max)
              if (err > 50.0) {
                bad.incrementAndGet()
                println(f"MISS idx=$i page=$p planted=$planted%5d nLines=${ls.length}%2d med=$med%8.1f err=$err%6.1f")
              }
            }
          }
        }
      }
    }
    println(f"FULL rows=$rows pagesWithLines=${pages.get} misses=${bad.get} worstErr=${worst.get / 10.0}%.1f")
  }
}
