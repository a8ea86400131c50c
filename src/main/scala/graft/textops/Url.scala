package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup a crawl pipeline runs
  * (before any content is fetched or hashed, the frontier dedups on
  * the NORMALIZED url; at recrawl scale this removes the majority of
  * candidate fetches). The canonical form applied here is the
  * standard conservative set every published frontier uses, each
  * rule a pure string/regex transform both engines replay:
  *
  *  1. scheme and host lowercase (RFC 3986 §6.2.2.1 — case-insensitive
  *     components; the PATH stays case-sensitive);
  *  2. fragment dropped (never sent to the server);
  *  3. default ports stripped (`:80` for http, `:443` for https);
  *  4. leading `www.` dropped (the usual alias fold);
  *  5. tracking params dropped (`utm_*`, `gclid`, `fbclid`) and the
  *     surviving query params SORTED (param order is almost never
  *     semantic; sorting folds permutations);
  *  6. empty path → `/`; a trailing slash on a non-root path dropped.
  *
  * One narrow projection — no shuffle, no UDF; composes with
  * [[graft.dedup.Dedup.exact]]-style keep-first on the canonical
  * column for frontier dedup.
  */
object Url {

  private val UrlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Canonical form of `url`; NULL for strings that don't parse as
    * absolute `scheme://host...` URLs (dirty rows surface — the
    * caller decides whether to drop or keep-raw).
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val host0 = lower(regexp_extract(url, UrlRe, 2))
    val host1 = regexp_replace(host0, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host1, ":80$", ""))
      .when(scheme === "https", regexp_replace(host1, ":443$", ""))
      .otherwise(host1)
    val path0 = regexp_extract(url, UrlRe, 3)
    val path = when(path0 === "", lit("/"))
      .when(path0 =!= "/", regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val q0 = regexp_extract(url, UrlRe, 4) // includes leading '?', or ''
    val params = filter(
      split(regexp_replace(q0, "^\\?", ""), "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)"))
    val q = array_join(array_sort(params), "&")
    when(scheme =!= "" && host =!= "",
      concat(scheme, lit("://"), host, path,
        when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Deterministic messy-URL fixture for the registered row: the
    * driver corpus has no URL column, so each doc gets a URL derived
    * from its own (source, doc_id) with md5-bucket-chosen mess —
    * uppercase scheme/host, www, default port, tracking params,
    * unsorted params, fragments, trailing slash — covering every
    * canonicalization rule; the oracle replays the construction.
    */
  def urlFixture(id: Column, source: Column): Column = {
    val b = graft.util.Sampling.md5Bucket(id)
    val tail = when(b < 20, lit("/?utm_source=x&b=2&a=1#frag"))
      .when(b < 40, lit("?a=1&utm_campaign=y&fbclid=z"))
      .when(b < 60, lit("/#section-2"))
      .when(b < 80, lit("?z=9&a=1"))
      .otherwise(lit(""))
    concat(lit("HTTP://WWW."), upper(source), lit(".Example.COM:80/Docs/"),
      id.cast("string"), tail)
  }
}
