package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation: canonical URLs are the dedup
  * key crawl pipelines group on, and the registered domain is the
  * quota/mixture grain ("at most N pages per domain" via
  * [[graft.operators.Curation.perGroupCap]]).
  *
  * Everything is a chain of codegen'd regexp expressions — no UDF, no
  * java.net.URL (whose parsing allocates and throws on the garbage
  * real crawls contain). The patterns avoid lookarounds and lazy
  * quantifiers so the exact same automata run under Java regex here
  * and RE2 in the DuckDB oracle (`url1_canonicalize`).
  */
object UrlOps {

  /** Canonical form: fragment dropped; scheme+authority lowercased
    * (path/query case preserved — significant on most servers);
    * default ports stripped (https :443, http :80 — a mismatched
    * port like http://x:443 is NOT touched); utm_* / fbclid / gclid
    * tracking params removed with separators re-tied; trailing slash
    * dropped. Scheme-less strings pass through (minus tracking/
    * fragment/slash cleanup) rather than erroring. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val prefix = regexp_extract(noFrag, "^([^/?#]*://[^/?#]*)", 1)
    val lowered = when(prefix === "", noFrag)
      .otherwise(concat(lower(prefix),
        regexp_replace(noFrag, "^[^/?#]*://[^/?#]*", "")))
    val noHttpsPort = regexp_replace(lowered,
      "^(https://[^/?#:]*):443($|[/?#].*)", "$1$2")
    val noHttpPort = regexp_replace(noHttpsPort,
      "^(http://[^/?#:]*):80($|[/?#].*)", "$1$2")
    // a tracked param BEFORE another param: the separator that led it
    // survives, the trailing & goes with it
    val noTrkMid = regexp_replace(noHttpPort,
      "([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*&", "$1")
    // a tracked param at the END takes its own separator with it
    val noTrkEnd = regexp_replace(noTrkMid,
      "[?&](utm_[^=&#]*|fbclid|gclid)=[^&#]*$", "")
    regexp_replace(noTrkEnd, "/$", "")
  }

  /** Lowercased host of an absolute URL: authority minus userinfo and
    * port. Empty string when there is no `scheme://` (callers filter
    * or default — a null would poison downstream group keys). */
  def hostOf(u: Column): Column =
    lower(regexp_extract(u, "^[^/?#]*://([^/?#@]*@)?([^/?#:]*)", 2))

  /** Snapshot SUBSET of the public suffix list (publicsuffix.org) —
    * enough for the corpora the gates exercise; production swaps in
    * the full list (same longest-match fold, ~9k entries, still one
    * codegen'd when-chain or a broadcast map join). */
  val publicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "co.in", "co.nz", "com.cn",
    "com.mx", "github.io", "gitlab.io", "pages.dev", "web.app",
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "ai", "dev", "app", "co", "me", "tv", "cc", "us", "uk",
    "de", "fr", "jp", "cn", "au", "br", "in", "ru", "nl", "it", "es")

  /** Registrable domain (eTLD+1): the longest matching public suffix
    * plus one label — `www.shop.example.co.uk` → `example.co.uk`.
    * Null when no known suffix matches, or the host IS a bare suffix
    * (PSL semantics: nothing is registrable there). Longest suffix
    * wins, so `co.uk` beats `uk`.
    *
    * Implementation: the snapshot list holds only 1- and 2-label
    * suffixes, so longest-match reduces to "is the 2-label tail a
    * suffix? else is the 1-label tail?" — three tail extractions +
    * set-membership (`isInCollection` compiles to an O(1) InSet probe)
    * instead of the per-suffix regexp fold this replaced. The fold's
    * generated code was ~5k lines PER CALL: two calls in one projection
    * (the link-graph edge shape — page domain + href domain) crossed
    * janino's method limit and dropped the whole stage to interpreted
    * eval, 40× slower (the wg1 lesson). Semantics are identical — the
    * url1 oracle still replays the original fold and hash-matches.
    * A full PSL swap-in keeps this shape: group the ~9k suffixes by
    * label count and add a 3-label tail probe. */
  def registeredDomain(host: Column): Column = {
    val h = lower(host)
    val (twoLabel, oneLabel) = publicSuffixes.partition(_.contains("."))
    require(twoLabel.forall(_.count(_ == '.') == 1),
      "registeredDomain: suffix list grew a 3-label entry — add the " +
        "3-label tail probe before shipping it")
    val tail1 = regexp_extract(h, "([^.]+)$", 1)
    val tail2 = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val tail3 = regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    def orNull(c: Column): Column =
      when(c === "", lit(null).cast("string")).otherwise(c)
    when(h.isInCollection(publicSuffixes), lit(null).cast("string"))
      .when(tail2.isInCollection(twoLabel), orNull(tail3))
      .when(tail1.isInCollection(oneLabel), orNull(tail2))
      .otherwise(lit(null).cast("string"))
  }
}
