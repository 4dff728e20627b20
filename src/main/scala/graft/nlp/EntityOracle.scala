package graft.nlp

/** DuckDB mirror of the [[EntityMatcher]] engine, generated FROM the
  * same rule table (the q39/q49 shared-rule-table pattern): each rule's
  * Java regex source is embedded verbatim (every pattern is RE2-safe —
  * no lookaround/backrefs), and each normalizer has a SQL twin keyed by
  * rule name. A rule added without a SQL normalizer fails fast here, so
  * the mirror cannot silently fall behind the engine.
  *
  * Soundness note (why naive per-rule extraction mirrors the engine):
  * the engine's overlap suppression only changes the output when two
  * rules match OVERLAPPING spans. The oracle re-derives entities per
  * rule independently, so equality with the engine on the driver's
  * corpus is also a NO-CROSS-RULE-OVERLAP proof for that corpus — if an
  * overlap ever appears, the engine emits fewer rows than the oracle
  * and the hash check goes red instead of silently passing.
  */
object EntityOracle {

  /** SQL normalizer per rule name: a function from the match-column
    * expression (the normalization group's text) to the normalized
    * value — the exact twin of Rule.normalize. */
  private def normSql(rule: String, m: String): String = rule match {
    case "invoice_number" | "po_number" | "order_number" | "account_number" |
         "reference_number" | "ssn" | "ein" | "vat" | "url" => m
    case "percentage" => m
    case "email" => s"lower($m)"
    case "phone" => s"regexp_replace($m, '[^0-9+]', '', 'g')"
    case "money_usd" | "money_eur" | "money_gbp" =>
      // normalizeMoney: strip currency/space, absorb trailing
      // punctuation, then last-separator-with-1-2-trailing-digits is
      // the decimal mark (EU swap) else grouping-only
      s"""(WITH c AS (SELECT regexp_replace(regexp_replace(regexp_replace($m, '[$$€£ ]', '', 'g'), '(?i)usd|eur|gbp', '', 'g'), '[.,]+$$', '') AS s)
         | SELECT printf('%.2f', CAST(CASE
         |   WHEN regexp_matches(s, ',[0-9]{1,2}$$') THEN replace(replace(s, '.', ''), ',', '.')
         |   WHEN regexp_matches(s, '\\.[0-9]{1,2}$$') THEN replace(s, ',', '')
         |   ELSE replace(replace(s, ',', ''), '.', '') END AS DOUBLE)) FROM c)""".stripMargin
    case "date_iso" =>
      s"""(WITH p AS (SELECT CAST(regexp_extract($m,'([0-9]{4})-([0-9]{2})-([0-9]{2})',1) AS INT) y,
         |   CAST(regexp_extract($m,'([0-9]{4})-([0-9]{2})-([0-9]{2})',2) AS INT) mo,
         |   CAST(regexp_extract($m,'([0-9]{4})-([0-9]{2})-([0-9]{2})',3) AS INT) d)
         | SELECT CASE WHEN mo BETWEEN 1 AND 12 AND d BETWEEN 1 AND 31 AND y BETWEEN 1900 AND 2100
         |   THEN printf('%04d-%02d-%02d', y, mo, d) ELSE $m END FROM p)""".stripMargin
    case "date_mdy" =>
      // MDY preferred, DMY fallback, 2-digit-year pivot at 50
      s"""(WITH p AS (SELECT CAST(regexp_extract($m,'([0-9]{1,2})/([0-9]{1,2})/([0-9]{2,4})',1) AS INT) a,
         |   CAST(regexp_extract($m,'([0-9]{1,2})/([0-9]{1,2})/([0-9]{2,4})',2) AS INT) b,
         |   CAST(regexp_extract($m,'([0-9]{1,2})/([0-9]{1,2})/([0-9]{2,4})',3) AS INT) yr),
         | q AS (SELECT a, b, CASE WHEN yr >= 100 THEN yr WHEN yr < 50 THEN 2000+yr ELSE 1900+yr END y FROM p)
         | SELECT CASE
         |   WHEN a BETWEEN 1 AND 12 AND b BETWEEN 1 AND 31 AND y BETWEEN 1900 AND 2100 THEN printf('%04d-%02d-%02d', y, a, b)
         |   WHEN b BETWEEN 1 AND 12 AND a BETWEEN 1 AND 31 AND y BETWEEN 1900 AND 2100 THEN printf('%04d-%02d-%02d', y, b, a)
         |   ELSE $m END FROM q)""".stripMargin
    case "date_written" =>
      val monthCase = "CASE lower(regexp_extract(" + m + ",'(?i)^([a-z]+)',1)) " +
        Seq("january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4, "may" -> 5,
          "june" -> 6, "july" -> 7, "august" -> 8, "september" -> 9, "october" -> 10,
          "november" -> 11, "december" -> 12, "jan" -> 1, "feb" -> 2, "mar" -> 3,
          "apr" -> 4, "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9, "sept" -> 9,
          "oct" -> 10, "nov" -> 11, "dec" -> 12)
          .map { case (n, v) => s"WHEN '$n' THEN $v" }.mkString(" ") + " END"
      s"""(WITH p AS (SELECT $monthCase mo,
         |   CAST(regexp_extract($m,'([0-9]{1,2})(?:st|nd|rd|th)?,?\\s+[0-9]{2,4}$$',1) AS INT) d,
         |   CAST(regexp_extract($m,'([0-9]{2,4})$$',1) AS INT) yr),
         | q AS (SELECT mo, d, CASE WHEN yr >= 100 THEN yr WHEN yr < 50 THEN 2000+yr ELSE 1900+yr END y FROM p)
         | SELECT CASE WHEN mo BETWEEN 1 AND 12 AND d BETWEEN 1 AND 31 AND y BETWEEN 1900 AND 2100
         |   THEN printf('%04d-%02d-%02d', y, mo, d) ELSE $m END FROM q)""".stripMargin
    case other => throw new IllegalStateException(
      s"EntityMatcher rule '$other' has no SQL normalizer — add its DuckDB twin to EntityOracle")
  }

  /** Which regex group is the normalization input, per rule (group 1
    * for the id families whose normalize is idNorm on group 1; group 0
    * otherwise). Mirrors each Rule.normalize's input. */
  private def normGroup(rule: String): Int = rule match {
    case "invoice_number" | "po_number" | "order_number" | "account_number" |
         "reference_number" | "ssn" | "ein" | "vat" | "percentage" => 1
    case _ => 0
  }

  private def q(s: String): String = s.replace("'", "''")

  /** UNION ALL of every rule's matches over `baseRel` (a relation with
    * columns url, t): url, text (full match), label, normalized, rule.
    * Occurrence order inside one rule is regexp_extract_all order ==
    * document order (the engine's start order within a rule). */
  def entitiesUnionSql(baseRel: String): String =
    EntityMatcher.rules.map { r =>
      val pat = q(r.pattern.pattern())
      val grp = normGroup(r.name)
      s"""SELECT url, text, '${r.label}' AS label, ${normSql(r.name, "m")} AS normalized, '${r.name}' AS rule, rank, idx
         |FROM (SELECT url,
         |        unnest(regexp_extract_all(t, '$pat', 0)) AS text,
         |        unnest(regexp_extract_all(t, '$pat', $grp)) AS m,
         |        unnest(range(len(regexp_extract_all(t, '$pat', 0)))) AS idx,
         |        ${rankOf(r.name)} AS rank
         |      FROM $baseRel)""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Priority rank (0 = highest) — EntityMatcher.rulesByPriority order,
    * the first key of the first-match-wins comparison. */
  private def rankOf(name: String): Int = {
    val order = EntityMatcher.rules.sortBy(-_.priority).map(_.name)
    order.indexOf(name)
  }

  /** q28 oracle: the flat entity table. */
  def flatSql(baseRel: String): String =
    s"""SELECT url, text, label, normalized, rule
       |FROM (${entitiesUnionSql(baseRel)})""".stripMargin

  /** q29 oracle: first-match-wins per (url, label) — winner = min by
    * (rule priority rank, in-document occurrence) — pivoted to the five
    * projected field columns; any-entity docs only (the engine's
    * size(map_keys) > 0 filter). */
  def fieldsSql(baseRel: String): String =
    s"""WITH ents AS (${entitiesUnionSql(baseRel)}),
       |w AS (SELECT url, label, normalized,
       |        row_number() OVER (PARTITION BY url, label ORDER BY rank, idx) rn
       |      FROM ents)
       |SELECT url,
       |  max(CASE WHEN label='INVOICE_NUMBER' THEN normalized END) AS invoice_number,
       |  max(CASE WHEN label='MONEY' THEN normalized END) AS amount,
       |  max(CASE WHEN label='DATE' THEN normalized END) AS "date",
       |  max(CASE WHEN label='EMAIL' THEN normalized END) AS email,
       |  max(CASE WHEN label='PHONE' THEN normalized END) AS phone
       |FROM w WHERE rn = 1 GROUP BY url""".stripMargin
}
