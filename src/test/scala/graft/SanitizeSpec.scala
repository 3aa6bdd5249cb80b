package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sanitize

/** Sanitization pins: the NA convention and the mojibake repair. */
class SanitizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clean(v: String): Option[String] =
    Option(Seq(v).toDF("v").select(Sanitize.clean(col("v"))).collect().head.getString(0))

  private def fix(v: String): String =
    Seq(v).toDF("v").select(Sanitize.fixDoubleUtf8(col("v"))).collect().head.getString(0)

  test("clean: trims ALL whitespace, collapses runs, empties become NULL") {
    assert(clean("  a\t b\n") == Some("a b"))
    assert(clean("a") == Some("a"))
    assert(clean("") == None)
    assert(clean(" \t\n ") == None, "whitespace-only must be the same NULL as absent")
    assert(clean("a   b\t\tc") == Some("a b c"))
  }

  test("fixDoubleUtf8 repairs Latin-1-misdecoded UTF-8, leaves genuine text alone") {
    // "café" whose UTF-8 bytes were re-decoded as Latin-1
    val broken = new String("café".getBytes("UTF-8"), "ISO-8859-1")
    assert(broken != "café" && fix(broken) == "café")
    // multi-char: "über schön"
    val b2 = new String("über schön".getBytes("UTF-8"), "ISO-8859-1")
    assert(fix(b2) == "über schön")
    // genuine accented text (no continuation-range follower) is untouched
    assert(fix("não") == "não")
    assert(fix("Ã then ascii") == "Ã then ascii")
    assert(fix("plain ascii") == "plain ascii")
  }
}
