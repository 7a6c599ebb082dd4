package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Web/crawl curation primitives: URL → host extraction and domain
 * blocklisting with subdomain semantics ("block example.com" also blocks
 * cdn.example.com) — the standard first gate of a crawl-derived corpus.
 *
 * Scale design: suffix matching is re-expressed as an EQUI join — each
 * URL's host explodes into its parent-domain chain (a.b.c → [a.b.c, b.c,
 * c], bounded by label count), which joins the blocklist by equality.
 * That keeps the planner in hash-join land (broadcast when the blocklist
 * is small, shuffle-hash when it is millions of rows) instead of the
 * LIKE-suffix nested loop a naive translation produces. For KiB-scale
 * blocklists [[blockByDomainSet]] folds the whole check into one scalar
 * predicate — zero joins, zero shuffles.
 */
object Web {

  /** Lowercased host of a URL; null when the value does not parse as one. */
  def domainOf(url: Column): Column = {
    val host = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    nullif(lower(host), lit(""))
  }

  /** Parent-domain chain of a host: a.b.c → [a.b.c, b.c, c]. */
  def domainSuffixes(domain: Column): Column = {
    val parts = split(domain, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /**
   * Drop rows whose URL host equals — or is a subdomain of — any blocklist
   * domain. Blocklist as a DataFrame of `domain` rows: suffix chain explodes
   * to an equi semi-join (hit set), then an anti join back by `idCol`.
   */
  def blockByDomain(df: DataFrame, idCol: String, urlCol: Column,
                    blocklist: DataFrame): DataFrame = {
    val sfx = df.select(col(idCol),
        explode(domainSuffixes(domainOf(urlCol))).as("domain"))
    val hitIds = sfx.join(blocklist.select(col("domain")), Seq("domain"), "left_semi")
      .select(col(idCol)).distinct()
    df.join(hitIds, Seq(idCol), "left_anti")
  }

  /** Scalar-predicate variant for small blocklists: the blocked set rides
    * the plan as an array literal, the check is one `arrays_overlap` —
    * no join, no shuffle, composes with pushdown around it. */
  def blockByDomainSet(df: DataFrame, urlCol: Column,
                       blocked: Seq[String]): DataFrame = {
    val blockedArr = array(blocked.map(d => lit(d.toLowerCase)): _*)
    df.filter(domainOf(urlCol).isNull ||
      !arrays_overlap(domainSuffixes(domainOf(urlCol)), blockedArr))
  }

  /**
   * URL canonicalization for crawl dedup: two crawls of the same page
   * routinely differ only in case, default port, fragment, tracking
   * params, or a trailing slash — canonicalize first, THEN dedup, or the
   * exact-dedup pass silently keeps near-infinite URL aliases.
   *
   * Steps (each a codegen'd, RE2-safe column expression — no UDF, no
   * shuffle; the whole chain fuses into the scan):
   *  1. drop the #fragment;
   *  2. lowercase scheme + authority (path/query stay case-sensitive);
   *  3. strip default ports (:80 / :443);
   *  4. remove tracking params (utm_*, fbclid, gclid, ref) wherever they
   *     sit in the query string, then repair separators (?& → ?, && → &,
   *     trailing ? or &);
   *  5. collapse a bare trailing slash (path "/" or end-of-path).
   */
  def canonicalizeUrl(url: Column): Column = {
    // authority = scheme://host[:port] — the prefix up to the first /, ? or #
    val noFrag = regexp_replace(url, "#.*", "")
    val auth = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = substring_index_safe(noFrag, auth)
    // default ports are scheme-specific: http://host:443 names a DIFFERENT
    // resource than http://host, so strip :80 only under http and :443
    // only under https
    val authLc = regexp_replace(regexp_replace(lower(auth),
      "^(http://[^/:]*):80$", "$1"), "^(https://[^/:]*):443$", "$1")
    val noTrack = regexp_replace(rest,
      "([?&])(utm_[a-zA-Z0-9_]*|fbclid|gclid|ref)=[^&#]*", "$1")
    val fixedSep = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "\\?&+", "?"), "&&+", "&"), "[?&]+$", "")
    val noSlash = regexp_replace(regexp_replace(fixedSep, "/\\?", "?"), "/$", "")
    concat(authLc, noSlash)
  }

  /** Suffix of `s` after the literal prefix `pre` (pre is a column whose
    * value is a prefix of s by construction). */
  private def substring_index_safe(s: Column, pre: Column): Column =
    s.substr(length(pre) + 1, lit(Int.MaxValue))
}
