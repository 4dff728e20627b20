package graft.forms

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Page

/** Signature-pair comparison as a first-class query (J5) — the
  * re-expression of the reference's compare_signatures
  * (/root/reference/ocrworker/signature_extractor.py:313-355: normalize
  * both signatures to a common frame, correlation coefficient mapped to
  * [0,1]) and the pairwise compare task
  * (/root/reference/ocrworker/form_tasks.py:231-258, is_match at
  * similarity > 0.75).
  *
  * The pixel correlation becomes char-trigram Jaccard over the
  * "signature card" — the form's detected field lines (type:label:value)
  * — which is likewise scale-normalized and in [0,1]. Pairing is
  * BLOCKED by the normalized signer name with a per-signer cap, never
  * all-pairs: the same equi-join shape as the LSH dedup paths, safe at
  * 10^12 forms (a real deployment blocks by signer id / tenant).
  */
object SignatureCompare {

  val MatchThreshold = 0.75 // form_tasks.py:257
  val MaxPerSigner = 40     // deterministic per-bucket cap (by url)

  /** Canonical signature card: the form's detected fields, line-ordered. */
  def card(fields: Array[DetectedField]): String =
    fields.sortBy(f => (f.line, f.label))
      .map(f => s"${f.fieldType}:${f.label}:${f.value}")
      .mkString("|")

  private def charTrigrams(s: String): Array[Long] = {
    if (s.length < 3) return Array(graft.ops.Dedup.hash64(s))
    val set = new java.util.HashSet[Long]()
    var i = 0
    while (i + 3 <= s.length) {
      set.add(graft.ops.Dedup.hash64(s.substring(i, i + 3)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** [0,1] similarity of two signature cards. */
  def similarity(a: String, b: String): Double =
    graft.ops.Dedup.jaccard(charTrigrams(a), charTrigrams(b))

  /** Detected signed forms: (url, signer, card) for every page whose
    * form has both a name field and a signature field. */
  def signedForms(pages: Dataset[Page]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions { it =>
      it.flatMap { p =>
        val r = FormDetector.detectHtml(p.html)
        if (!r.isForm) Iterator.empty
        else {
          val name = r.fields.find(f => f.fieldType == "name" && f.value.nonEmpty)
          val hasSig = r.fields.exists(_.fieldType == "signature")
          if (name.isEmpty || !hasSig) Iterator.empty
          else Iterator.single((p.url,
            name.get.value.toLowerCase(java.util.Locale.ROOT).trim,
            card(r.fields)))
        }
      }
    }.toDF("url", "signer", "card")
  }

  /** All same-signer pairs with similarity + is_match. */
  def pairs(forms: DataFrame): DataFrame = {
    val spark = forms.sparkSession
    import spark.implicits._
    val capped = forms
      .withColumn("rn", row_number().over(
        Window.partitionBy("signer").orderBy("url")))
      .filter(col("rn") <= MaxPerSigner)
      .drop("rn")
    val a = capped.select(col("signer"), col("url").as("a_url"), col("card").as("a_card"))
    val b = capped.select(col("signer"), col("url").as("b_url"), col("card").as("b_card"))
    a.join(b, Seq("signer"))
      .filter(col("a_url") < col("b_url"))
      .select(col("signer"), col("a_url"), col("b_url"), col("a_card"), col("b_card"))
      .as[(String, String, String, String, String)]
      .mapPartitions { it =>
        it.map { case (signer, au, bu, ac, bc) =>
          val sim = similarity(ac, bc)
          (signer, au, bu, sim, sim > MatchThreshold)
        }
      }
      .toDF("signer", "a_url", "b_url", "similarity", "is_match")
  }
}
