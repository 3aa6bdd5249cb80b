package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the FIRST operator of every web-crawl corpus
  * build (the trafilatura/jusText class, reduced to its deterministic
  * core): drop non-content blocks, strip tags, decode the common
  * entities, normalize whitespace; plus the link-density signal
  * boilerplate classifiers cut on. All composed from codegen'd regex
  * functions with RE2-compatible patterns ((?s) + non-greedy — no
  * backreferences, no lookaround), so every step has an exact DuckDB
  * mirror and the extraction is bit-reproducible across engines.
  */
object Html {

  /** Non-content blocks whose INNER TEXT must not leak into the corpus.
    * One pattern PER TAG: RE2 has no backreferences, and the r9 combined
    * alternation `<(script|style)…>.*?</(script|style)>` let an open tag
    * pair with the OTHER tag's close (`<script>a</style>` deleted through
    * a style close — wrong content dropped/leaked on unbalanced markup).
    * Separate patterns make an open tag pair only with its own close. */
  private[graft] val BlockPats: Seq[String] = Seq(
    "(?s)<script[^>]*>.*?</script>",
    "(?s)<style[^>]*>.*?</style>")
  private[graft] val CommentPat = "(?s)<!--.*?-->"
  private[graft] val TagPat = "(?s)<[^>]*>"
  /** Anchor inner text — group 1; the numerator of link density. */
  private[graft] val AnchorPat = "(?s)<a[ >][^>]*>(.*?)</a>"

  /** Entity decode chain — &amp; LAST so already-decoded entities cannot
    * cascade (&amp;lt; must yield "&lt;", not "<"). */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Extracted text: blocks out, comments out, tags → space, entities
    * decoded, whitespace collapsed, trimmed. */
  def toText(html: Column): Column = {
    val noBlocks = regexp_replace(
      BlockPats.foldLeft(html)((c, p) => regexp_replace(c, p, " ")), CommentPat, " ")
    val noTags = regexp_replace(noBlocks, TagPat, " ")
    // entity strings contain no regex-special chars, and the replacements
    // no $/\ — the same literal patterns drive Java regex and RE2
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, s"${TextFunctions.Ws}+", " "))
  }

  /** Number of anchors. */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit(AnchorPat), lit(0)))

  /** Characters of anchor inner text (tags inside the anchor stripped) —
    * the link-density numerator. */
  def anchorTextChars(html: Column): Column =
    aggregate(
      transform(regexp_extract_all(html, lit(AnchorPat), lit(1)),
        a => length(trim(regexp_replace(regexp_replace(a, TagPat, " "),
          s"${TextFunctions.Ws}+", " ")))),
      lit(0L), (acc, x) => acc + x)

  /** Link density = anchor text chars / extracted text chars (0 for empty
    * docs) — high-density pages are navigation boilerplate. */
  def linkDensity(html: Column): Column = {
    val total = length(toText(html))
    when(total === 0, lit(0.0))
      .otherwise(anchorTextChars(html).cast("double") / total.cast("double"))
  }
}
