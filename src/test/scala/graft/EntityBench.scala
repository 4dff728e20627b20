package graft
import graft.core.Extract
import graft.gen.PageGen
import graft.nlp.EntityMatcher

/** Per-rule profiling of the entity engine over generated extraction
  * output (single-threaded; run nothing else concurrently). */
object EntityBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val texts = (0 until n).iterator
      .map(i => PageGen.genRow(PageGen.DefaultSeed, i.toLong))
      .filter(_.kind == "html")
      .map(g => Extract(g.page).extracted_text)
      .toArray
    val chars = texts.map(_.length.toLong).sum
    // warmup
    (0 until 2).foreach(_ => texts.foreach(EntityMatcher.matchEntities))
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: ${texts.length} docs in $s%.3f s = ${texts.length / s}%.0f docs/s, ${chars / s / 1e6}%.1f MB/s")
      s
    }
    time("matchEntities   ") { texts.foreach(EntityMatcher.matchEntities) }
    time("match+fields    ") { texts.foreach(t => EntityMatcher.assignFields(EntityMatcher.matchEntities(t))) }
    // per-rule scan cost (no suppression)
    EntityMatcher.rules.foreach { r =>
      val t0 = System.nanoTime()
      var hits = 0
      texts.foreach { t =>
        val lower = t.toLowerCase(java.util.Locale.ROOT)
        if (r.triggers.isEmpty || r.triggers.exists(lower.contains)) {
          val m = r.pattern.matcher(t)
          while (m.find()) hits += 1
        }
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  rule ${r.name}%-18s $s%.3f s  hits=$hits")
    }
    // lowercase cost alone
    time("toLowerCase only") { texts.foreach(_.toLowerCase(java.util.Locale.ROOT)) }
  }
}
