package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE host-extraction expression, shared by every path that keys,
  * salts, or groups by host (flagship commit clustering, scaling bench,
  * streaming metrics, q19 host rollup).
  *
  * Why not `parse_url(url, 'HOST')`: ParseUrl is a non-codegen
  * interpreted expression (it constructs a java.net.URI per row) and
  * was measured as a 10x per-row cost in the q19 host rollup (round-2
  * fix). The codegen'd `substring_index` form below stays inside
  * WholeStageCodegen and is string-slicing only. Semantics match for
  * any scheme://host/path url (the input contract from the crawl);
  * for a scheme-less string it returns the leading path segment where
  * parse_url would return NULL — fine for partitioning keys and for
  * the well-formed urls the pipeline ingests.
  */
object Hosts {

  /** Host of a `scheme://host/path...` url — codegen'd, no URI parse. */
  def hostOf(url: Column): Column =
    substring_index(substring_index(url, "/", 3), "/", -1)

  /** Salted clustering key for skew-safe host partitioning: hot zipfian
    * hosts spread over `saltBuckets` buckets keyed by a hash of the
    * full url, so no single output partition absorbs a head host. */
  def saltedHostKey(url: Column, saltBuckets: Int): Column =
    concat(hostOf(url), lit("#"), pmod(hash(url), lit(saltBuckets)))
}
