package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.charset.StandardCharsets.UTF_8
import graft.html.MainContentExtractor

/** One-off deep differential fuzzer (run manually):
  *   sbt "Test/runMain graft.DeepFuzz [n]"
  * Compares the byte and string tokenizers on large random tag soup
  * including arbitrary unicode, NBSP, and raw control bytes.
  */
object DeepFuzz {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val soup = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString),
      Gen.const("<"), Gen.const(">"), Gen.const("</"), Gen.const("<div a=\"x>y\">"),
      Gen.const("&amp;"), Gen.const("&#xE9;"), Gen.const("&#"), Gen.const("&bogus;"),
      Gen.const("é漢字ü ß"), Gen.const(" "),
      Gen.const("<!--"), Gen.const("-->"),
      Gen.const("<script>if(a<b){}</script>"), Gen.const("<script>"),
      Gen.const("<style>a>b{}</style>"), Gen.const("<p>"), Gen.const("</p>"),
      Gen.const("<title>"), Gen.const("</title>"), Gen.const("<![CDATA["),
      Gen.const("]]>"), Gen.const(" "), Gen.const(""), Gen.const(""))
    ).map(_.mkString)
    var seed = Seed(1234L)
    var done = 0
    var attempts = 0
    var maxLen = 0
    while (done < n && attempts < n * 4) {
      soup.apply(Gen.Parameters.default.withSize(1 + attempts % 200), seed) match {
        case Some(s0) =>
          // sanitize lone surrogates (not representable in UTF-8; both
          // paths would replace them differently by design)
          val s = new String(s0.getBytes(UTF_8), UTF_8)
          maxLen = math.max(maxLen, s.length)
          val a = MainContentExtractor.extract(s)
          val b = MainContentExtractor.extractBytes(s.getBytes(UTF_8))
          if (a.text != b.text || a.title != b.title || a.nBlocks != b.nBlocks ||
              !a.outLinks.sameElements(b.outLinks)) {
            System.err.println(s"DIVERGED on (${s.length} chars): ${s.take(300)}")
            sys.exit(1)
          }
          done += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    println(s"DEEPFUZZ OK: $done samples, max len $maxLen")
  }
}
