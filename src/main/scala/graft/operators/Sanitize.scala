package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Input sanitization — the reference's sanitize-before-validate surface
  * (it trims and normalizes every character column before staging),
  * plus the crawl-era repair a text pipeline needs: mojibake fixing.
  *
  *  - [[clean]]: trim all whitespace (not just spaces — `trim()` alone
  *    strips 0x20 only), collapse internal whitespace runs to one space,
  *    map the now-empty string to NULL (the reference's NA convention:
  *    "" and NA must mean the same absent value, or keys hash apart).
  *  - [[fixDoubleUtf8]]: repair the classic double-encoding (UTF-8 bytes
  *    re-decoded as Latin-1, the "Ã©" class of corruption) by reversing
  *    the exact transformation: re-encode the chars as Latin-1 bytes and
  *    decode them as UTF-8 — ftfy's core move, expressed with Spark's
  *    codegen'd encode/decode. Applied ONLY when the text matches the
  *    mojibake signature (a UTF-8 lead byte char followed by a
  *    continuation-byte char), so clean text — including genuine "Ã"
  *    followed by ASCII — passes through untouched.
  */
object Sanitize {

  /** Whitespace-normalize and NULL-out empties (see class doc). */
  def clean(c: Column): Column = {
    val collapsed = regexp_replace(c, "[ \\t\\n\\r\\f]+", " ")
    val trimmed = regexp_replace(collapsed, "^ | $", "")
    when(trimmed === "", lit(null).cast("string")).otherwise(trimmed)
  }

  /** Mojibake signature: a char in the UTF-8 two/three-byte lead range
    * misdecoded as Latin-1 (U+00C2-U+00EF) immediately followed by a char
    * from the continuation-byte range (U+0080-U+00BF as Latin-1 chars).
    * Genuine text virtually never pairs these. */
  private val MojibakePat = "[\u00c2-\u00ef][\u0080-\u00bf]"

  /** Reverse Latin-1-misdecoded UTF-8 where the signature matches. */
  def fixDoubleUtf8(c: Column): Column =
    when(c.rlike(MojibakePat), decode(encode(c, "ISO-8859-1"), "UTF-8"))
      .otherwise(c)
}
