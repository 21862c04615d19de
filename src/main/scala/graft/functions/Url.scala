package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL handling for crawl pipelines — the identity question BEFORE
  * content dedup: the same page is crawled as `HTTPS://Example.COM/a
  * ?id=1&utm_source=feed#top` and `https://example.com/a?id=1`, and a
  * URL-level dedup that misses the equivalence fetches, stores and
  * near-dedups the same document twice. Built entirely from Spark's
  * codegen'd built-ins (`parse_url`, HOF filter) — no UDFs.
  */
object Url {

  private val TrackingParams = Seq("utm_", "fbclid=", "gclid=", "msclkid=")

  /** Canonical form for URL-level dedup: scheme and host lowercased,
    * fragment dropped, tracking parameters (utm_*, fbclid, gclid,
    * msclkid) stripped — remaining query params keep their original
    * order (reordering would conflate genuinely different requests on
    * servers that care), and a query emptied by stripping drops its
    * `?`. Path case is preserved (paths are case-sensitive per
    * RFC 3986; hosts are not).
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val host = lower(parse_url(url, lit("HOST")))
    val path = coalesce(parse_url(url, lit("PATH")), lit(""))
    val query = coalesce(parse_url(url, lit("QUERY")), lit(""))
    val kept = filter(split(query, "&"), p =>
      TrackingParams.map(t => p.startsWith(t)).reduce(_ || _).unary_!)
    val fq = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(fq === "", lit("")).otherwise(concat(lit("?"), fq)))
  }

  /** Last two host labels — the per-site rollup key (docs per domain,
    * domain quality priors). SIMPLIFIED: `bbc.co.uk` collapses to
    * `co.uk`. Kept as the dependency-free approximation; use
    * [[registrableDomainPsl]] (the Public-Suffix-List-backed form)
    * wherever multi-label registries matter — i.e. any real crawl.
    */
  def registrableDomain(url: Column): Column = {
    val labels = split(lower(parse_url(url, lit("HOST"))), "\\.")
    concat(element_at(labels, -2), lit("."), element_at(labels, -1))
  }

  /** PSL-backed registrable domain (eTLD+1) of a URL: `bbc.co.uk` and
    * `news.bbc.co.uk` both map to `bbc.co.uk`, `user.github.io` stays
    * a distinct site. See [[Psl]] for the embedded snapshot table and
    * the swap path to the full published list. NULL when the host is
    * itself a public suffix or malformed.
    */
  def registrableDomainPsl(url: Column): Column =
    Psl.registrableDomain(lower(parse_url(url, lit("HOST"))))
}
