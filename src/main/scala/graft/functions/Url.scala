package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass that makes crawl-level
  * URL dedup possible: the same page arrives as `HTTP://Site.com:80/a?b=2&a=1#x`
  * and `http://site.com/a?a=1&b=2`, and a canonical form must map both to
  * one key. Rules (the standard RFC 3986 + tracker-strip set):
  * lowercase scheme and host, drop the scheme's default port, drop the
  * fragment, drop `utm_*` tracking parameters, sort the surviving query
  * parameters, empty path → "/". Pure string/array functions with exact
  * DuckDB mirrors — canonical keys are bit-identical across engines.
  */
object Url {

  private val Pat = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)(#.*)?$"

  /** Canonical form of an absolute http(s) URL column. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, Pat, 1))
    val authority = lower(regexp_extract(url, Pat, 2))
    val rawPath = regexp_extract(url, Pat, 3)
    val rawQuery = regexp_extract(url, Pat, 4)
    // default-port strip: :80 for http, :443 for https
    val host = when(scheme === "http", regexp_replace(authority, ":80$", ""))
      .when(scheme === "https", regexp_replace(authority, ":443$", ""))
      .otherwise(authority)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val query = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    concat(scheme, lit("://"), host, path, query)
  }
}
