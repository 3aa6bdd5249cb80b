package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Html, Url}

/** HTML extraction + URL canonicalization unit pins on hand-built edge
  * cases the synthesized gate corpus cannot cover. */
class WebFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def text(html: String): String =
    Seq(html).toDF("h").select(Html.toText(col("h"))).collect().head.getString(0)

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Url.canonicalize(col("u"))).collect().head.getString(0)

  test("toText: scripts/styles/comments drop with their CONTENT, tags strip, entities decode") {
    assert(text("<p>a</p><script>var x = 'SECRET';</script><p>b</p>") == "a b")
    assert(text("<style>.x { color: red }</style>hi") == "hi")
    assert(text("be<!-- not this -->fore") == "be fore")
    assert(text("5 &lt; 6 &amp; 7 &gt; 2") == "5 < 6 & 7 > 2")
    // &amp;lt; must decode to the LITERAL "&lt;", never cascade to "<"
    assert(text("x &amp;lt; y") == "x &lt; y")
    assert(text("a\n\n  b\tc") == "a b c")
    assert(text("") == "")
  }

  test("link density: anchor text over extracted text; nested tags inside anchors stripped") {
    val h = "<a href=\"/x\">one <b>two</b></a> and body text here"
    val (links, chars, dens) = Seq(h).toDF("h")
      .select(Html.linkCount(col("h")), Html.anchorTextChars(col("h")),
        Html.linkDensity(col("h")))
      .as[(Int, Long, Double)].head()
    assert(links == 1)
    assert(chars == "one two".length)
    assert(dens > 0.0 && dens < 1.0)
    // pure-boilerplate page: only the inter-anchor space is non-link text
    val nav = "<a href=\"/a\">home</a> <a href=\"/b\">next</a>"
    val d2 = Seq(nav).toDF("h").select(Html.linkDensity(col("h"))).as[Double].head()
    assert(d2 == 8.0 / 9.0, s"nav density $d2")
  }

  test("canonicalize: host case, default ports, fragments, trackers, param order") {
    assert(canon("HTTPS://Ex.COM:443/a?b=2&a=1") == "https://ex.com/a?a=1&b=2")
    assert(canon("http://ex.com:80/a") == "http://ex.com/a")
    assert(canon("http://ex.com:8080/a") == "http://ex.com:8080/a", "non-default port survives")
    assert(canon("https://ex.com:80/a") == "https://ex.com:80/a", "http's default is not https's")
    assert(canon("https://ex.com/p#frag") == "https://ex.com/p")
    assert(canon("https://ex.com/p?utm_source=x&utm_medium=y") == "https://ex.com/p")
    assert(canon("https://ex.com") == "https://ex.com/", "empty path normalizes to /")
    // the dedup property: all spellings of one page share one key
    val variants = Seq(
      "HTTPS://EX.com:443/page?b=2&a=1#top",
      "https://ex.com/page?a=1&b=2",
      "https://ex.com/page?utm_campaign=z&b=2&a=1")
    assert(variants.map(canon).distinct.size == 1)
  }
}
