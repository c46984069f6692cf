package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain keys — the crawl-side family upstream of
  * every dedup pass (RefinedWeb's URL-level dedup runs BEFORE content
  * dedup: most crawl duplicates are the same page re-fetched under a
  * cosmetically different URL). Extends the reference's record-level
  * fix_url (reference: srm_tools/url_utils.py:6 — scheme fix / domain
  * gate, modeled by q51) with the corpus-level operations it stops short
  * of: a canonical URL KEY and the per-domain rollup a blocklist/quality
  * pipeline aggregates over.
  *
  * Canonical key rules (the standard crawl normalization):
  *   - scheme + host lowercase (path/query case is semantic — preserved)
  *   - default ports stripped (:80, :443)
  *   - fragment dropped
  *   - tracking params dropped (utm_*, gclid, fbclid, ref)
  *   - remaining query params sorted bytewise
  *   - trailing path slashes stripped
  *
  * Everything is a codegen'd regexp/split/sort chain in the RE2∩Java
  * dialect (no lookarounds, no backrefs) so the DuckDB oracle replays the
  * exact semantics; no higher-order lambdas (the tracking strip is a
  * global regexp_replace, not a list filter). Map-only: a canonicalization
  * pass over a crawl shuffles nothing. Malformed/scheme-less URLs are the
  * caller's gate (compose with q51's fix_url rules first); these
  * expressions assume `scheme://host...` shape and return empty parts
  * otherwise.
  */
object Urls {

  /** Tracking params dropped by canonicalization. `(^|&)`-anchored so a
    * legitimate `ref`-suffixed param name (e.g. `href=`) never matches,
    * and the value is OPTIONAL (`(=[^&]*)?`) so a valueless `?fbclid` /
    * `&gclid` is stripped too — but guarded by `\b` (ASCII word boundary,
    * identical in the Java and RE2 dialects) so the optional value never
    * turns `ref` into a prefix-match that eats `refresh=1`. Adjacent
    * valueless params ("&fbclid&gclid") each keep their own leading '&',
    * so one global pass removes both — no trailing-separator consumption. */
  private[graft] val TrackingRe = "(^|&)(utm_[^=&]*|gclid|fbclid|ref)\\b(=[^&]*)?"

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host with the port stripped ONLY when it is the default
    * FOR the URL's scheme: `http://h:443` is a real non-default-port
    * endpoint and must NOT collide with `http://h` (and vice versa for
    * `https://h:80`) — a scheme-blind strip would URL-dedup two
    * different resources into one. */
  private def hostOf(u: Column): Column = {
    val raw = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    when(schemeOf(u) === "http", regexp_replace(raw, ":80$", ""))
      .when(schemeOf(u) === "https", regexp_replace(raw, ":443$", ""))
      .otherwise(raw)
  }

  private def pathOf(u: Column): Column =
    regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")

  /** Surviving query params, tracking-stripped and bytewise-sorted;
    * empty string when none survive. The extraction is anchored to a '?'
    * that PRECEDES any '#' (`^[^#?]*\?`): a hash-routing URL whose only
    * '?' lives inside the fragment (`http://h/p#/route?tab=1`) has no
    * real query, and fragment params must not leak into the canonical
    * key — the fragment-dropped rule applies to everything after '#'. */
  private def paramsOf(u: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(regexp_extract(u, "^[^#?]*\\?([^#]*)", 1), TrackingRe, ""),
      "^&+", "")
    when(cleaned === "", lit(""))
      .otherwise(array_join(array_sort(split(cleaned, "&")), "&"))
  }

  /** The canonical URL key: two fetches of the same resource under
    * cosmetically different URLs collide on it. */
  def canonicalUrl(u: Column): Column = {
    val p = paramsOf(u)
    concat(schemeOf(u), lit("://"), hostOf(u), pathOf(u),
      when(p === "", lit("")).otherwise(concat(lit("?"), p)))
  }

  /** The domain rollup key: lowercased host with ANY port and the
    * leading `www.` stripped — a rollup/blocklist keys on the
    * registrable host, so `site.com:8080` and `site.com` aggregate
    * together even though their canonical URLs stay distinct. */
  def urlDomain(u: Column): Column =
    regexp_replace(regexp_replace(hostOf(u), ":[0-9]+$", ""), "^www\\.", "")
}
