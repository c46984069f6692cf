package graft

import org.apache.spark.sql.functions._
import graft.operators.Urls

/** Pins URL canonicalization edges against hand-written expectations —
  * the q171 DuckDB oracle mirrors the same regexes, so it can never
  * catch a rule both sides get wrong; these cases are the independent
  * gate (the r10 ADVICE found exactly such a mirrored defect: fragment
  * '?' params leaking into the canonical key).
  */
class UrlsSpec extends SpecBase {
  import spark.implicits._

  private def canon1(u: String): String =
    Seq(Tuple1(u)).toDF("u").select(Urls.canonicalUrl(col("u")).as("c"))
      .head().getString(0)

  private def domain1(u: String): String =
    Seq(Tuple1(u)).toDF("u").select(Urls.urlDomain(col("u")).as("d"))
      .head().getString(0)

  test("fragment '?' never leaks params into the canonical key") {
    // hash-routing shape: the ONLY '?' lives inside the fragment — the
    // URL has no query, and the whole fragment drops
    assert(canon1("http://Host.com/app#/route?tab=1&b=9") ==
      "http://host.com/app")
    // a real query followed by a fragment that itself contains '?'
    assert(canon1("http://h.com/p?a=1#frag?x=2") == "http://h.com/p?a=1")
  }

  test("valueless tracking params strip; prefix-named params survive") {
    // '?fbclid' / '&gclid' with no '=' must still strip (r10 ADVICE)
    assert(canon1("https://h.com/p?fbclid") == "https://h.com/p")
    assert(canon1("https://h.com/p?a=1&gclid") == "https://h.com/p?a=1")
    // adjacent valueless tracking params both strip in the one pass
    assert(canon1("https://h.com/p?fbclid&gclid&a=1") == "https://h.com/p?a=1")
    // 'refresh=1' must NOT be eaten by a prefix-match on 'ref' (the \b
    // guard) — nor 'href=' by the (^|&) anchor
    assert(canon1("https://h.com/p?refresh=1") == "https://h.com/p?refresh=1")
    assert(canon1("https://h.com/p?href=x&ref=y") == "https://h.com/p?href=x")
  }

  test("scheme-conditional default ports, sort, trailing slash, domain") {
    assert(canon1("HTTPS://WWW.Site.COM:443/Dir/?b=1&utm_source=x&a=2#f") ==
      "https://www.site.com/Dir?a=2&b=1")
    // :443 on http is a REAL port and survives
    assert(canon1("http://h.com:443/p") == "http://h.com:443/p")
    assert(domain1("https://WWW.Site.com:8080/x") == "site.com")
  }
}
