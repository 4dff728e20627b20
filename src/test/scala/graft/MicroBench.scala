package graft
import graft.core.Extract
import graft.gen.PageGen
object MicroBench {
  def main(args: Array[String]): Unit = {
    val gens = (0 until 4000).map(i => PageGen.genRow(PageGen.DefaultSeed, i.toLong))
    val htmls = gens.filter(_.kind == "html").map(_.page)
    val pdfs = gens.filter(_.kind == "pdf").map(_.page)
    // warmup
    (0 until 3).foreach { _ => htmls.foreach(Extract(_)); pdfs.foreach(Extract(_)) }
    def time[T](label: String, n: Int, bytes: Long)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $n docs in $s%.3f s = ${n / s}%.0f docs/s, ${bytes / s / 1e6}%.1f MB/s")
    }
    val hb = htmls.map(_.html.length.toLong).sum
    val pb = pdfs.map(_.html.length.toLong).sum
    time("html", htmls.size, hb) { htmls.foreach(Extract(_)) }
    time("pdf ", pdfs.size, pb) { pdfs.foreach(Extract(_)) }
    // tokenizer-only vs classify+assemble
    val strs = htmls.map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
    time("tokenize+blocks", strs.size, hb) {
      strs.foreach { s => val b = new graft.html.BlockBuilder; graft.html.HtmlTokenizer.tokenize(s, b); b.result() }
    }
    time("decode utf8", strs.size, hb) { htmls.foreach(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8)) }
  }
}
