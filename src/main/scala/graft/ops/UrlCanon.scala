package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup: collapse the cosmetic variants
  * a crawler sees of the same resource (scheme/host case, default
  * ports, fragments, tracking query params, param order, trailing
  * slashes) onto one canonical key, so url-level dedup and host/url
  * keyed joins don't treat `HTTPS://A.COM:443/x/?b=2&a=1#f` and
  * `https://a.com/x?a=1&b=2` as different pages.
  *
  * Everything is composed from codegen'd string/array functions — no
  * UDF, no java.net.URI per row (the parse_url lesson from q19) — so
  * the whole kernel stays inside WholeStageCodegen and is exactly
  * mirrorable in the DuckDB oracle (see GraftQueries q64).
  *
  * Rules (documented order):
  *   1. drop the fragment (`#...`)
  *   2. lowercase the scheme://host[:port] part (path case preserved)
  *   3. drop the default port (`:443` for https, `:80` for http)
  *   4. drop tracking query params (utm_*, gclid, fbclid, ref)
  *   5. sort the surviving params bytewise; drop the `?` if none left
  *   6. strip trailing slashes from the path
  */
object UrlCanon {

  /** Params stripped by rule 4 — the public tracking-param families. */
  private def isTracking(p: Column): Column =
    p.startsWith("utm_") || p.startsWith("gclid=") ||
      p.startsWith("fbclid=") || p.startsWith("ref=")

  /** The canonical form of `url` (expects `scheme://host[:port][/path][?q][#f]`). */
  def canonicalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    // '' when there is no '?': substring past the end is empty
    val query = noFrag.substr(length(base) + lit(2), lit(Int.MaxValue))
    val schemeHost = lower(substring_index(base, "/", 3))
    val path = base.substr(length(schemeHost) + lit(1), lit(Int.MaxValue))
    val noPort =
      when(schemeHost.startsWith("https://"), regexp_replace(schemeHost, ":443$", ""))
        .when(schemeHost.startsWith("http://"), regexp_replace(schemeHost, ":80$", ""))
        .otherwise(schemeHost)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !isTracking(p)))
    val qs = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    concat(noPort, rtrim(path, "/"), qs)
  }
}
