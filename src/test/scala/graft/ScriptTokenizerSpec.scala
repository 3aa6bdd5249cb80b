package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Non-whitespace-script text handling: the script-aware tokenizer and the
  * charset-profile langid fallback. Before this, a CJK/Thai document
  * tokenized to ~1 giant token, got no language, and slipped every
  * token-based quality/dedup/packing gate — the day-one failure mode of a
  * multilingual crawl corpus. */
class ScriptTokenizerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def toks(text: String): Seq[String] =
    Seq(text).toDF("text").select(TextFunctions.tokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)

  private def lang(text: String): String =
    Seq(text).toDF("text")
      .select(TextFunctions.langId(col("text"), TextFunctions.tokens(col("text"))))
      .collect().head.getString(0)

  test("Latin text tokenizes exactly like the old whitespace split") {
    assert(toks("The quick  Brown\tfox.\n") == Seq("the", "quick", "brown", "fox."))
    assert(toks("a b") == Seq("a", "b"))
  }

  test("empty and all-whitespace input yield zero tokens, not one empty token") {
    assert(toks("") == Nil)
    assert(toks("  \t\n") == Nil)
  }

  test("Han tokenizes per character — the unigram segmentation") {
    // 我爱北京 = 4 ideographs → 4 tokens
    assert(toks("我爱北京") == Seq("我", "爱", "北", "京"))
    // mixed Latin + Han splits at the script boundary
    assert(toks("hello我们world") == Seq("hello", "我", "们", "world"))
  }

  test("Kana, Hangul and Thai tokenize as same-script runs") {
    assert(toks("これはテスト") == Seq("これはテスト")) // pure-kana run
    // Han per char, hiragana+katakana merge into one contiguous-range run
    assert(toks("日本のアニメ") == Seq("日", "本", "のアニメ"))
    assert(toks("한국어 텍스트") == Seq("한국어", "텍스트"))
    assert(toks("ภาษาไทย test") == Seq("ภาษาไทย", "test"))
  }

  test("CJK documents get sane token counts for quality/packing operators") {
    val n = Seq("这是一个足够长的中文文档我们要统计它的词元数量")
      .toDF("text").select(size(TextFunctions.tokens(col("text"))))
      .collect().head.getInt(0)
    assert(n >= 20, s"Han doc must count per-char tokens, got $n")
  }

  test("langId: stopword path still wins for whitespace scripts") {
    assert(lang("the cat and the hat is on a mat") == "en")
    assert(lang("der Hund und die Katze ist nicht ein Vogel") == "de")
  }

  test("langId: charset fallback classifies CJK/Thai that has no stopword hits") {
    assert(lang("请把这份文件翻译成中文谢谢") == "zh")
    assert(lang("ここにほんごのぶんしょうがあります") == "ja")
    assert(lang("안녕하세요 한국어 문장입니다") == "ko")
    assert(lang("นี่คือข้อความภาษาไทย") == "th")
    assert(lang("@#$%^ 12345") == "und", "no script, no stopwords -> und")
  }

  test("langId: zh stopword profile fires via per-char tokens (的 is a token now)") {
    // contains 的/是 — the stopword path, not the fallback, decides
    assert(lang("这是我的书") == "zh")
  }

  test("fast path = regex path: split-and-drop-empties equals the extraction on script-free text") {
    // the guard routes script-free docs through split; both branches must
    // be value-identical there — force the regex branch and compare
    val texts = Seq("The quick  Brown\tfox.", "a b", "", "  \t", "x--y!! z",
      "punct,comma;semi", "0123 4a5b")
    val both = texts.toDF("text").select(
      TextFunctions.tokens(col("text")).as("fast"),
      regexp_extract_all(lower(trim(col("text"))),
        lit(TextFunctions.TokenPattern), lit(0)).as("regex"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"branch divergence: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    // and the SQL-expr form agrees with the Column form on mixed scripts
    val mixed = Seq("hello我们world", "これはテスト ok", "plain text")
    val pair = mixed.toDF("text").selectExpr(
      s"${TextFunctions.tokensSqlExpr("text")} AS a").collect().map(_.getSeq[String](0))
    val colForm = mixed.toDF("text")
      .select(TextFunctions.tokens(col("text"))).collect().map(_.getSeq[String](0))
    assert(pair.toSeq == colForm.toSeq)
  }

  test("TokenPattern string embeds in a SQL literal unchanged (no quotes, literal BMP chars)") {
    assert(!TextFunctions.TokenPattern.contains("'"))
    assert(!TextFunctions.TokenPattern.contains("\\u"),
      "ranges must be literal chars — RE2 has no \\uXXXX escape")
  }
}
