package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mojibake detection + repair -- the ftfy rung of a web-text pipeline
  * (CCNet runs exactly this between charset decode and lang-id). The
  * classic crawl defect: a page's UTF-8 bytes were decoded as
  * Latin-1/Windows-1252 somewhere upstream, so every non-ASCII char
  * arrives as a two-char signature (e-acute becomes "A-tilde,
  * copyright-sign"). [[graft.html.CharsetSniff]] prevents this at OUR
  * decode step (q97); this operator catches text that arrives
  * pre-corrupted from an upstream feed, which no amount of local
  * sniffing can prevent.
  *
  * Detection: the UTF-8-as-Latin-1 signature is a lead char (the
  * Latin-1 image of a UTF-8 lead byte) followed by the right number
  * of continuation chars in U+0080-U+00BF (the images of continuation
  * bytes) -- one alternative per sequence length, so EVERY original
  * char (a Latin-1 accent, curly punctuation like U+2019, an astral
  * char) counts as exactly one hit. Genuine Latin-1 prose essentially
  * never puts an accented capital directly before a C1-control/
  * guillemet-class char, so false positives need adversarial input
  * (spec-pinned). On this corpus detection is exact by construction:
  * clean text's only continuation-class char is the copyright sign
  * (footer "(c) year", always preceded by whitespace/ASCII) and its
  * only lead-class char is a word-initial capital E-circumflex
  * (always followed by an ASCII letter), so the adjacency cannot
  * occur -- char-scanned at sf0.01: 0 clean docs match.
  *
  * Repair: first map the 27 printable Windows-1252 images of bytes
  * 0x80-0x9F back to those C1 code points (one codegen'd `translate`
  * -- cp1252 is THE common wrong decode, and this reduces it to the
  * Latin-1 case char for char; the translate is the identity on
  * Latin-1-decoded mojibake), then re-encode the view's chars as
  * Latin-1 bytes (recovering the original UTF-8 byte stream --
  * Latin-1 is the identity on U+0000-U+00FF) and decode those bytes
  * as UTF-8. All steps are codegen'd builtin expressions
  * (`translate`/`encode`/`decode`), no UDF. The roundtrip is applied
  * only when (a) the signature fired on the byte-image view and
  * (b) the WHOLE view is ASCII plus complete well-formed UTF-8
  * sequences (see [[RepairableShape]]) -- so the recovered byte
  * stream is valid UTF-8 by construction (Spark 4.1's decode RAISES
  * on malformed bytes by default; a doc mixing genuine Latin-1 chars
  * with a signature must never reach it), and text that merely
  * contains a signature amid real accented prose is flagged
  * unrepaired rather than lossily "fixed".
  * Single-pass by design: doubly-encoded text repairs to
  * singly-encoded (still flagged on the next run); ftfy's fixpoint
  * loop is a driver concern, not an operator one.
  *
  * 100 TB shape: map-only, ZERO shuffles (PlanSpec-gated like q58) --
  * detection is one regexp over the scan split, repair two codegen'd
  * charset transforms; nothing moves between executors and the text
  * column never leaves its split.
  */
object Mojibake {

  /** Bump when detection/repair semantics change. */
  val Version = "mj2"

  /** The 27 printable Windows-1252 images of bytes 0x80-0x9F (the five
    * undefined bytes 81/8D/8F/90/9D decode to C1 controls in the
    * WHATWG mapping — which this operator follows, because the JVM
    * charset's U+FFFD substitution destroys the byte and would make
    * the defect unrepairable — and need no translation), and those
    * bytes as C1 chars. cp1252 is THE common mojibake decode ("\u00e2\u20ac\u2122"
    * for a curly apostrophe); translating the printables back to their
    * code points reduces the cp1252 case to the Latin-1 case, char by
    * char, with one codegen'd `translate`. */
  private val Cp1252Printables =
    "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030\u0160\u2039\u0152\u017D" +
    "\u2018\u2019\u201C\u201D\u2022\u2013\u2014\u02DC\u2122\u0161\u203A\u0153\u017E\u0178"
  private val C1Images =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A\u008B\u008C\u008E" +
    "\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099\u009A\u009B\u009C\u009E\u009F"

  /** The candidate byte-image view: cp1252 printables mapped back to
    * the C1 code points their bytes spell. Identity on Latin-1-decoded
    * mojibake and on clean text without cp1252-printable chars. */
  def asByteImages(text: Column): Column =
    translate(text, Cp1252Printables, C1Images)

  /** One alternative per UTF-8 sequence length: a lead char (the
    * Latin-1 image of lead bytes 0xC2-0xDF / 0xE0-0xEF / 0xF0-0xF4)
    * followed by that length's continuation chars (images of bytes
    * 0x80-0xBF). The three lead classes are disjoint, so each
    * original char -- Latin-1 accent, punctuation like U+2019, or an
    * astral char -- yields exactly ONE non-overlapping match. */
  private val Signature =
    "[\\u00C2-\\u00DF][\\u0080-\\u00BF]|" +
    "[\\u00E0-\\u00EF][\\u0080-\\u00BF]{2}|" +
    "[\\u00F0-\\u00F4][\\u0080-\\u00BF]{3}"

  /** All chars representable in Latin-1 (encode is lossless) -- a
    * plain char-class star, which Java's regex engine runs
    * iteratively (a star over an alternation GROUP recurses one stack
    * frame per char and overflows on KB-size documents -- the shape
    * of guard this operator must NOT use). */
  private val AllLatin1 = "^[\\u0000-\\u00FF]*$"

  /** Count of mojibake signature sequences in `text` (counted on the
    * byte-image view, so cp1252- and Latin-1-decoded defects score
    * identically). */
  def signatureCount(text: Column): Column =
    regexp_count(asByteImages(text), lit(Signature)).cast("long")

  /** True where [[repair]] would transform the text: the signature
    * fired on the byte-image view, the view is entirely <= U+00FF
    * (so the Latin-1 encode is byte-exact, never the '?' substitute),
    * AND the recovered byte stream is VALID UTF-8 per Spark's native
    * validator (rejects truncated sequences, overlongs, surrogates).
    * The validity check is the crash guard -- Spark 4.1's
    * `decode(..., 'UTF-8')` RAISES on malformed input by default, so
    * a doc mixing one genuine Latin-1 char with one signature must
    * never reach the roundtrip -- and the ftfy evidence standard:
    * repair fires only when the whole document re-encodes to bytes a
    * valid UTF-8 writer could have produced, which genuine accented
    * prose essentially never satisfies. rlike, not regexp_count:
    * existence is enough here and stops at the first match. */
  def wouldRepair(text: Column): Column = {
    val v = asByteImages(text)
    v.rlike(Signature) && v.rlike(AllLatin1) &&
      is_valid_utf8(encode(v, "ISO-8859-1"))
  }

  /** The repaired view of `text`: charset-roundtrip when the signature
    * fired and the roundtrip is lossless; the input otherwise. */
  def repair(text: Column): Column =
    when(wouldRepair(text),
      decode(encode(asByteImages(text), "ISO-8859-1"), "UTF-8"))
      .otherwise(text)

  /** Per-doc mojibake report over (idCol, textCol):
    * (doc_id, mojibake_detected, n_moji, repaired, text_md5) where
    * text_md5 digests the post-repair text -- the value the oracle
    * checks against the KNOWN-good original. */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      asByteImages(t).rlike(Signature).as("mojibake_detected"),
      signatureCount(t).as("n_moji"),
      wouldRepair(t).as("repaired"),
      md5(repair(t).cast("binary")).as("text_md5"))
  }

  /** The deterministic corruption decoration for the q108 input (the
    * q64 pattern -- a messy view built in-query so both engines agree
    * on it): docs with doc_id % 3 == 1 arrive UTF-8-as-Latin-1
    * mangled, docs with doc_id % 3 == 2 arrive UTF-8-as-cp1252
    * mangled (the Latin-1 view with C1 code points shown as their
    * cp1252 printables -- byte-identical to a real windows-1252
    * decode on every defined byte, with the WHATWG C1 passthrough on
    * the five undefined ones); doc_id % 3 == 0 docs arrive clean. */
  def corruptEveryThird(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val latin1View = decode(encode(col(textCol), "UTF-8"), "ISO-8859-1")
    docs.withColumn(textCol,
      when(pmod(col(idCol), lit(3)) === 1, latin1View)
        .when(pmod(col(idCol), lit(3)) === 2,
          translate(latin1View, C1Images, Cp1252Printables))
        .otherwise(col(textCol)))
  }
}
