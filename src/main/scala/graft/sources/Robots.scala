package graft.sources

/** Crawl-compliance: RFC 9309 robots.txt parsing and longest-match
  * allow/deny decisions. The reference worker consumes an already-
  * curated queue, but any Common-Crawl-style ingestion front-end (the
  * pipeline this engine feeds) must gate fetches on robots rules; this
  * is the missing politeness rung under sources/Warc.
  *
  * Parser semantics (RFC 9309 §2): line-oriented `key: value` records,
  * `#` starts a comment, keys are case-insensitive, a GROUP is one or
  * more consecutive User-agent lines followed by its rules, groups for
  * the same product token MERGE, the most specific matching group wins
  * (exact product token beats `*`), non-group directives (Sitemap,
  * Crawl-delay) are tolerated and ignored, and an empty Disallow value
  * means "no rule". Decision (§2.2.2): the rule with the LONGEST
  * matching path prefix applies; on a length tie allow wins; with no
  * matching rule (or no group) the url is allowed.
  *
  * The per-host robots TEXT used by q93 is a pure function of
  * md5(host) ([[robotsTxt]]), so the DuckDB oracle re-derives every
  * decision in closed form from the url alone — the Scala parser and
  * matcher under test never leak into the oracle. */
object Robots {

  /** One parsed rule: `len` = prefix length (the longest-match key),
    * `a` = 1 for Allow / 0 for Disallow (the tie-break key — on equal
    * length allow wins), `p` = the path prefix. Field ORDER is the
    * comparison order `array_max` and the oracle rely on. */
  final case class Rule(len: Int, a: Int, p: String)

  /** Parse robots.txt for `agent`: the merged rule set of the most
    * specific matching group(s) — exact token match if any group names
    * it, else the `*` groups, else no rules. */
  def parse(txt: String, agent: String): Seq[Rule] = {
    val agentLc = agent.toLowerCase
    // (matched-agent-kind, rules) per group: 2 = exact, 1 = wildcard
    var groups = List.empty[(Int, List[Rule])]
    var currentAgents = List.empty[String]
    var currentRules = List.empty[Rule]
    var inRules = false
    def closeGroup(): Unit = {
      if (currentAgents.nonEmpty) {
        val kind =
          if (currentAgents.exists(_ == agentLc)) 2
          else if (currentAgents.contains("*")) 1
          else 0
        if (kind > 0) groups ::= (kind, currentRules.reverse)
      }
      currentAgents = Nil; currentRules = Nil; inRules = false
    }
    txt.split("\n", -1).foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (inRules) closeGroup() // a UA line after rules starts a new group
              currentAgents ::= value.toLowerCase
            case "allow" if currentAgents.nonEmpty =>
              inRules = true
              if (value.nonEmpty) currentRules ::= Rule(value.length, 1, value)
            case "disallow" if currentAgents.nonEmpty =>
              inRules = true
              // empty Disallow = "no rule" (RFC 9309 §2.2.2)
              if (value.nonEmpty) currentRules ::= Rule(value.length, 0, value)
            case _ => // Sitemap, Crawl-delay, unknown keys: tolerated, ignored
              if (currentAgents.nonEmpty) inRules = true
          }
        }
      }
    }
    closeGroup()
    val best = groups.map(_._1).maxOption.getOrElse(0)
    if (best == 0) Seq.empty
    else groups.filter(_._1 == best).flatMap(_._2) // same-token groups MERGE
  }

  /** Longest-match decision over a parsed rule set: (allowed, matched
    * prefix — "" when no rule matches). */
  def decide(rules: Seq[Rule], path: String): (Boolean, String) = {
    val matching = rules.filter(r => path.startsWith(r.p))
    if (matching.isEmpty) (true, "")
    else {
      val m = matching.maxBy(r => (r.len, r.a))
      (m.a == 1, m.p)
    }
  }

  /** Rule family of a host — first md5 hex digit mod 4, mirrored by the
    * oracle as CAST(('0x' || substr(md5(host),1,1)) AS INT) % 4. */
  def family(host: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(host.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) % 4
  }

  /** Deterministic robots.txt per host. Every family carries a decoy
    * `evilbot` group, comments, blank lines, and ignored non-group
    * directives, so the parser's group selection and tolerance are
    * always under test; family 3 adds a graftbot-specific group that
    * CONTRADICTS its `*` group — picking the wrong group flips every
    * decision on that host. */
  def robotsTxt(host: String): String = {
    val sb = new StringBuilder
    sb.append(s"# robots for $host\n")
    sb.append("Sitemap: https://").append(host).append("/sitemap.xml\n\n")
    sb.append("User-agent: evilbot\nDisallow: /\n\n")
    family(host) match {
      case 0 =>
        sb.append("User-agent: *\nCrawl-delay: 2\nDisallow:\n") // empty = no rule
      case 1 =>
        sb.append("User-agent: *\nDisallow: /page/1\n")
      case 2 =>
        sb.append("User-agent: *\nDISALLOW: /\nallow: /page/\n") // case-insensitive keys
      case _ =>
        sb.append("User-agent: *\nDisallow: /\n\n")
        sb.append("User-agent: graftbot # our product token\n")
        sb.append("Disallow: /page/\nAllow: /page/2\n")
    }
    sb.toString
  }

  /** The merged graftbot rule set of a host's generated robots.txt. */
  def ruleTable(host: String): Seq[Rule] = parse(robotsTxt(host), "graftbot")
}
