package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup key of every web-corpus
  * pipeline (crawl dumps carry the same page under `HTTP://WWW.Host/x?
  * utm_source=…#frag` spellings; canonicalizing before content dedup
  * removes the cheap bulk of duplicates without touching document text).
  *
  * Rules (the common subset of public crawler normalizers):
  *   1. scheme lowercased;
  *   2. host lowercased, leading `www.` dropped, default port dropped
  *      (`:80` for http, `:443` for https);
  *   3. fragment dropped;
  *   4. trailing slashes trimmed from the path (root collapses to "");
  *   5. tracking params (`utm_*`, `ref`, `fbclid`) dropped and the
  *      remaining query params SORTED — param order is transport noise.
  *
  * Everything is regexp/HOF built-ins (no UDF → whole-stage codegen, and
  * the narrow projection pipelines into whatever dedup follows). Regex
  * patterns deliberately avoid dialect-sensitive syntax (char classes
  * only — no lookarounds) so Java regex (Spark) and RE2 (DuckDB) agree;
  * [[canonicalSql]] emits the same pipeline for the oracle, with
  * list_filter/list_sort/array_to_string standing in for Spark's
  * filter/array_sort/array_join.
  */
object UrlOps {

  /** Canonical form of `url` per the rules above. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val rest0 = regexp_replace(url, "^[A-Za-z]+://", "")
    val rest = regexp_replace(rest0, "#.*$", "") // 3. fragment
    val hostport = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val host0 = regexp_replace(hostport, "^www[.]", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(when(scheme === "https", regexp_replace(host0, ":443$", ""))
        .otherwise(host0))
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val path = regexp_replace(regexp_replace(pathq, "[?].*$", ""), "/+$", "")
    val query = regexp_extract(pathq, "[?](.*)$", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref=") &&
        !p.startsWith("fbclid="))
    val canonQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
  }

  /** DuckDB expression equal to [[canonicalize]] over SQL fragment `url`.
    * `url` is referenced many times — pass a column name, not a costly
    * subexpression. */
  def canonicalSql(url: String): String = {
    val scheme = s"lower(regexp_extract($url, '^([A-Za-z]+)://', 1))"
    val rest =
      s"regexp_replace(regexp_replace($url, '^[A-Za-z]+://', ''), '#.*$$', '')"
    val hostport = s"lower(regexp_extract($rest, '^([^/?]+)', 1))"
    val host0 = s"regexp_replace($hostport, '^www[.]', '')"
    val host = s"""CASE WHEN $scheme = 'http'
                  |  THEN regexp_replace($host0, ':80$$', '')
                  |  WHEN $scheme = 'https'
                  |  THEN regexp_replace($host0, ':443$$', '')
                  |  ELSE $host0 END""".stripMargin
    val pathq = s"regexp_replace($rest, '^[^/?]+', '')"
    val path =
      s"regexp_replace(regexp_replace($pathq, '[?].*$$', ''), '/+$$', '')"
    val query = s"regexp_extract($pathq, '[?](.*)$$', 1)"
    val params = s"""list_filter(string_split($query, '&'), p ->
                    |  p <> '' AND p NOT LIKE 'utm!_%' ESCAPE '!'
                    |  AND p NOT LIKE 'ref=%' AND p NOT LIKE 'fbclid=%')"""
      .stripMargin
    val canonQ = s"array_to_string(list_sort($params), '&')"
    s"""($scheme || '://' || $host || $path ||
       |  CASE WHEN $canonQ = '' THEN '' ELSE '?' || $canonQ END)"""
      .stripMargin
  }
}
