package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Html, Url}

/** Web-ingest queries (SURVEY.md §2C): HTML → text extraction and URL
  * canonicalization — the first two operators of a crawl pipeline. The
  * corpus carries plain text, so each gate SYNTHESIZES its web-shaped
  * input deterministically in-query (the m_audio pattern: container
  * writer and decoder both under the gate) and the oracle replays both
  * the synthesis and the extraction. */
object Web {

  /** Deterministic messy-HTML wrapper around each document: headline from
    * the source field, body text, a per-doc anchor, a script block, a
    * comment, and entity-encoded punctuation — every stripping rule
    * exercised on every row. */
  private def htmlCol = concat(
    lit("<html><head><script>var x = 1 < 2;</script><style>p { color: red; }</style></head><body><h1>"),
    col("source"),
    lit("</h1><p>"), col("text"), lit("</p><a href=\"https://ex.com/d/"),
    col("doc_id").cast("string"), lit("\">doc "), col("doc_id").cast("string"),
    lit(" &amp; more</a><p>5 &lt; 6 &quot;q&quot; &#39;s&#39; &nbsp;end</p><!-- hidden --></body></html>"))

  private val htmlSql =
    """'<html><head><script>var x = 1 < 2;</script><style>p { color: red; }</style></head><body><h1>'
      | || source || '</h1><p>' || text || '</p><a href="https://ex.com/d/'
      | || CAST(doc_id AS VARCHAR) || '">doc ' || CAST(doc_id AS VARCHAR)
      | || ' &amp; more</a><p>5 &lt; 6 &quot;q&quot; &#39;s&#39; &nbsp;end</p><!-- hidden --></body></html>'"""
      .stripMargin.replace("\n", "")

  /** t_html: extraction metrics per document — text fingerprint + length
    * (proves scripts/styles/comments dropped, tags stripped, entities
    * decoded, whitespace collapsed), anchor count and link density (the
    * boilerplate signal). Narrow regex map over one scan, no shuffle. */
  def tHtml(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("html", htmlCol)
      .select(col("doc_id"),
        md5(Html.toText(col("html"))).as("text_fp"),
        length(Html.toText(col("html"))).cast("long").as("n_chars"),
        Html.linkCount(col("html")).cast("long").as("n_links"),
        Html.anchorTextChars(col("html")).as("link_chars"),
        Html.linkDensity(col("html")).as("link_density"))
      .orderBy(col("doc_id"))

  val tHtmlSql: String = {
    val comments = Html.CommentPat
    val tags = Html.TagPat
    val anchor = Html.AnchorPat
    // same pipeline, same order: per-tag blocks → comments → tags →
    // entities → ws
    val stripped = (Html.BlockPats :+ comments :+ tags)
      .foldLeft("html")((acc, p) => s"regexp_replace($acc, '$p', ' ', 'g')")
    val entityChain = Html.Entities.foldLeft(stripped) {
      case (acc, (e, r)) =>
        val rr = r.replace("'", "''")
        s"regexp_replace($acc, '$e', '$rr', 'g')"
    }
    val text = s"trim(regexp_replace($entityChain, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
    val anchorChars =
      s"""CAST(COALESCE(list_sum(list_transform(regexp_extract_all(html, '$anchor', 1),
         | a -> length(trim(regexp_replace(regexp_replace(a, '$tags', ' ', 'g'), '[ \\t\\n\\r\\f]+', ' ', 'g'))))), 0) AS BIGINT)"""
        .stripMargin.replace("\n", "")
    s"""SELECT doc_id, md5(t) AS text_fp, CAST(length(t) AS BIGINT) AS n_chars,
       |  CAST(len(regexp_extract_all(html, '$anchor', 0)) AS BIGINT) AS n_links,
       |  $anchorChars AS link_chars,
       |  CASE WHEN length(t) = 0 THEN 0.0
       |       ELSE CAST($anchorChars AS DOUBLE) / CAST(length(t) AS DOUBLE) END AS link_density
       |FROM (SELECT doc_id, html, $text AS t
       |      FROM (SELECT doc_id, $htmlSql AS html FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** Deterministic messy URL per document — doc_id % 4 picks the mess:
    * uppercase host+default port, tracking params + unsorted params,
    * fragment, or already-clean. */
  private def urlCol = {
    val id = col("doc_id").cast("string")
    when(col("doc_id") % 4 === 0,
        concat(lit("HTTPS://Ex.COM:443/d/"), id, lit("?b=2&a=1")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("http://ex.com:80/d/"), id, lit("?utm_source=feed&z=9&utm_medium=x&y=8")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://ex.com/d/"), id, lit("#section-2")))
      .otherwise(concat(lit("https://ex.com/d/"), id, lit("?a=1")))
  }

  private val urlSql =
    """CASE doc_id % 4
      | WHEN 0 THEN 'HTTPS://Ex.COM:443/d/' || CAST(doc_id AS VARCHAR) || '?b=2&a=1'
      | WHEN 1 THEN 'http://ex.com:80/d/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed&z=9&utm_medium=x&y=8'
      | WHEN 2 THEN 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) || '#section-2'
      | ELSE 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) || '?a=1'
      |END""".stripMargin.replace("\n", "")

  /** t_url_canon: canonical URL keys — lowercase scheme/host, default
    * port and fragment dropped, utm_* stripped, query params sorted.
    * Narrow map; the canonical key is what crawl dedup groups on. */
  def tUrlCanon(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("url", urlCol)
      .select(col("doc_id"), col("url"), Url.canonicalize(col("url")).as("canon_url"))
      .orderBy(col("doc_id"))

  val tUrlCanonSql: String = {
    val pat = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)(#.*)?$"
    s"""SELECT doc_id, url,
       |  scheme || '://' ||
       |  CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
       |       WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
       |       ELSE auth END ||
       |  CASE WHEN pth = '' THEN '/' ELSE pth END ||
       |  CASE WHEN len(params) = 0 THEN ''
       |       ELSE '?' || array_to_string(params, '&') END AS canon_url
       |FROM (
       |  SELECT doc_id, url,
       |    lower(regexp_extract(url, '$pat', 1)) AS scheme,
       |    lower(regexp_extract(url, '$pat', 2)) AS auth,
       |    regexp_extract(url, '$pat', 3) AS pth,
       |    list_sort(list_filter(string_split(regexp_extract(url, '$pat', 4), '&'),
       |      p -> p <> '' AND NOT starts_with(p, 'utm_'))) AS params
       |  FROM (SELECT doc_id, $urlSql AS url FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_html"      -> tHtml _,
    "t_url_canon" -> tUrlCanon _,
  )

  val oracle: Map[String, String] = Map(
    "t_html"      -> tHtmlSql,
    "t_url_canon" -> tUrlCanonSql,
  )
}
