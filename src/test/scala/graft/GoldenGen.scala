package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import graft.core.Extract
import graft.gen.PageGen

/** Regenerates the committed golden fixture file. Run ONLY when the
  * byte contract intentionally changes (new GenVersion or extraction
  * semantics), then commit the diff:
  *   sbt "Test/runMain graft.GoldenGen"
  * The fixture pins sha256(extracted_text) for the first 300 generated
  * pages — the cross-round drift guard the dynamic oracle cannot
  * provide (pipeline and oracle share code, so only a committed
  * fixture detects accidental contract changes).
  */
object GoldenGen {
  val N = 300
  val fixturePath = "src/test/resources/golden_sha256.tsv"

  def sha256(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(UTF_8)).map(b => f"$b%02x").mkString
  }

  def currentLines(): Seq[String] = {
    (0 until N).map { i =>
      val g = PageGen.genRow(PageGen.DefaultSeed, i.toLong)
      val e = Extract(g.page)
      s"$i\t${g.kind}\t${PageGen.GenVersion}\t${sha256(e.extracted_text)}"
    }
  }

  def main(args: Array[String]): Unit = {
    val p = Paths.get(fixturePath)
    Files.createDirectories(p.getParent)
    Files.writeString(p, currentLines().mkString("\n") + "\n")
    println(s"wrote $N golden hashes to $fixturePath (GenVersion ${PageGen.GenVersion})")
  }
}
