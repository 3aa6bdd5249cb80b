package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stable content-hash surrogate keys.
  *
  * The reference computes SHA-1 fingerprints over the natural-key columns of
  * every incoming dataframe so that re-imports are idempotent: the same
  * natural key always maps to the same surrogate id, with no central
  * sequence generator. That is exactly what a 1000-executor cluster wants —
  * id assignment is embarrassingly parallel, no coordination, no shuffle.
  *
  * We use md5 (same stability properties; present in every engine for
  * oracle parity). Nulls are sentinel-encoded before concatenation because
  * concat_ws silently drops nulls, which would make ("a", null) collide
  * with (null, "a") across column boundaries.
  */
object StableId {
  val Sep = "|"

  /** Escape a value so the concatenation is injective: backslashes double,
    * separators escape — so no value can fake a column boundary. After
    * escaping, a lone backslash can't occur, which makes "\N" a null
    * sentinel no real value collides with. */
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(c.cast("string"), "\\\\", "\\\\\\\\"), "\\|", "\\\\|")

  /** Expression form: md5 over the escaped, sentinel-encoded key columns. */
  def stableId(cols: Seq[Column]): Column =
    md5(concat_ws(Sep, cols.map(c => coalesce(esc(c), lit("\\N"))): _*))

  /** Append a surrogate-key column derived from `keyCols`. */
  def withStableId(df: DataFrame, keyCols: Seq[String], outCol: String = "sk"): DataFrame =
    df.withColumn(outCol, stableId(keyCols.map(col)))

  /** The same expression as DuckDB SQL, for oracle queries. */
  def oracleExpr(cols: Seq[String]): String = {
    val parts = cols.map { c =>
      s"coalesce(replace(replace(CAST($c AS VARCHAR), '\\', '\\\\'), '|', '\\|'), '\\N')"
    }
    s"md5(concat_ws('$Sep', ${parts.mkString(", ")}))"
  }
}
