package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-busting salted join.
  *
  * When a join key is heavily skewed (one customer with 10⁹ rows), the
  * shuffle sends the whole hot key to one reducer. Salting splits each hot
  * key into `factor` sub-keys: the large side gets a random-but-deterministic
  * salt (hash-derived, reproducible across retries — NEVER rand(), which
  * breaks task retry idempotency), the small side is replicated `factor`
  * ways. AQE's skew-join handles moderate skew automatically; salting is
  * for the pathological keys AQE can't split (e.g. a single key larger than
  * an executor).
  */
object Salting {

  /** Salt in [0, factor): hash of the row id, so even bit-identical
    * duplicate rows of a hot key spread out. Deterministic given the
    * partition layout (a task retry re-reads the same partition and
    * re-derives the same salts — unlike rand() without a seed). */
  private def salt(factor: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(factor))

  /** Inner-join `big` with `small` on `key`, salted `factor` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    val b = big.withColumn("__salt", salt(factor))
    val s = small.withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
