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
  * The DEFAULT algorithm is md5 (same stability properties; present in
  * every engine for oracle parity). The `algo` knob selects the digest for
  * schema compatibility:
  *  - "md5"    — the engine default; DuckDB-oracle-gated (e_stable_id);
  *  - "sha256" — for new schemas wanting a modern digest; DuckDB ships
  *               sha256, so this path is oracle-gated too (e_stable_id_sha);
  *  - "sha1"   — the digest n2kupdate is understood to compute over
  *               natural keys, offered for RECONCILING ids against an
  *               existing n2kresult database. DuckDB has no sha1, so this
  *               is a DECLARED no-oracle boundary: Spark-side spec only
  *               (EtlOperatorsSpec pins the digest against known vectors).
  *               CAVEAT: the reference checkout available to this build
  *               is empty, so sha1-of-payload is pinned by digest vectors
  *               and THIS ENGINE's payload layout (separator, escaping,
  *               null sentinel) is cross-engine verified as a string on
  *               adversarial values (e_payload_vectors) — but whether the
  *               REFERENCE's layout matches remains unverifiable. Before
  *               relying on this knob for legacy reconciliation, add a
  *               pinned vector taken from a real n2kresult row (key tuple
  *               → expected sid) to prove layout compatibility.
  *
  * Nulls are sentinel-encoded before concatenation because concat_ws
  * silently drops nulls, which would make ("a", null) collide with
  * (null, "a") across column boundaries.
  */
object StableId {
  val Sep = "|"
  val Algos: Set[String] = Set("md5", "sha1", "sha256")

  /** Escape a value so the concatenation is injective: backslashes double,
    * separators escape — so no value can fake a column boundary. After
    * escaping, a lone backslash can't occur, which makes "\N" a null
    * sentinel no real value collides with. */
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(c.cast("string"), "\\\\", "\\\\\\\\"), "\\|", "\\\\|")

  /** The escaped, sentinel-encoded payload STRING the digests hash —
    * public so the payload LAYOUT itself (separator, escaping, null
    * sentinel) is cross-engine verified as a string (e_payload_vectors,
    * on constructed adversarial values: embedded separators, embedded
    * backslashes, nulls, the literal "\N"). That narrows the sha1 leg's
    * no-oracle boundary to the DIGEST alone: the bytes sha1 hashes are
    * the same bytes the oracle-gated md5/sha256 legs hash, and those
    * bytes are compared engine-to-engine directly. */
  def payload(cols: Seq[Column]): Column =
    concat_ws(Sep, cols.map(c => coalesce(esc(c), lit("\\N"))): _*)

  /** Expression form: digest over the escaped, sentinel-encoded key
    * columns. All three algorithms hash the IDENTICAL payload bytes, so
    * switching algo never changes which rows collide — only the id
    * format. */
  def stableId(cols: Seq[Column], algo: String = "md5"): Column = {
    val payload = this.payload(cols)
    algo match {
      case "md5"    => md5(payload)
      case "sha256" => sha2(payload, 256)
      case "sha1"   => sha1(payload) // legacy n2kupdate parity; no DuckDB oracle
      case other => throw new IllegalArgumentException(
        s"unknown hash algo '$other' — one of ${Algos.mkString("/")}")
    }
  }

  /** Append a surrogate-key column derived from `keyCols`. */
  def withStableId(df: DataFrame, keyCols: Seq[String], outCol: String = "sk",
      algo: String = "md5"): DataFrame =
    df.withColumn(outCol, stableId(keyCols.map(col), algo))

  /** The same expression as DuckDB SQL, for oracle queries. sha1 is the
    * declared no-oracle boundary (DuckDB ships md5/sha256 only): ids for
    * a legacy n2kresult reconcile are verified by the Spark-side digest
    * spec, not a cross-engine gate. */
  /** The payload construction as DuckDB SQL — the oracle twin of
    * [[payload]], shared by [[oracleExpr]] and the e_payload_vectors
    * layout gate so the two cannot drift. */
  def oraclePayload(cols: Seq[String]): String = {
    val parts = cols.map { c =>
      s"coalesce(replace(replace(CAST($c AS VARCHAR), '\\', '\\\\'), '|', '\\|'), '\\N')"
    }
    s"concat_ws('$Sep', ${parts.mkString(", ")})"
  }

  def oracleExpr(cols: Seq[String], algo: String = "md5"): String = {
    val payload = oraclePayload(cols)
    algo match {
      case "md5"    => s"md5($payload)"
      case "sha256" => s"sha256($payload)"
      case "sha1" => throw new IllegalArgumentException(
        "sha1 is the legacy-n2kresult algorithm and DuckDB ships no sha1 — " +
          "no oracle parity; verify through the Spark-side digest spec")
      case other => throw new IllegalArgumentException(
        s"unknown hash algo '$other' — one of ${Algos.mkString("/")}")
    }
  }
}
