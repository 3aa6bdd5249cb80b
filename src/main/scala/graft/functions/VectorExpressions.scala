package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector / hashing hot paths
  * (SURVEY.md §2E). Higher-order functions (zip_with + aggregate) would
  * evaluate their lambdas interpreted per element — at 100 TB that is the
  * difference between a codegen'd tight loop over primitive arrays and a
  * per-element virtual call. These expressions generate straight-line Java
  * inside whole-stage codegen.
  *
  * Summation order is a deterministic left fold per accumulator, matching
  * the oracle's list_reduce, so doubles stay bitwise-comparable.
  */
object VectorExpressions {

  private def elemGetter(et: DataType): String = et match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** Vector args must be array<float|double> — reject anything else at
    * analysis time (SQL literals like array(1.0) arrive as decimal arrays). */
  private def checkVectorArgs(name: String, exprs: Seq[Expression]): TypeCheckResult = {
    val ok = exprs.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> or array<double> arguments, got " +
        exprs.map(_.dataType.simpleString).mkString(", "))
  }

  /** Cosine similarity between two float/double arrays; one pass, three
    * accumulators (dot, |a|², |b|²). */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkVectorArgs("cosine_sim", Seq(left, right))
    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(x.numElements(), y.numElements())
      val (lt, rt) = (elemType(left), elemType(right))
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (lg, rg) = (elemGetter(elemType(left)), elemGetter(elemType(right)))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val den = ctx.freshName("den")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double xv = (double) $a.$lg($i);
           |  double yv = (double) $b.$rg($i);
           |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
           |}
           |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |if ($den == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $den; }
           |""".stripMargin
      })
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Dot product (same conventions as CosineSim). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVectorArgs("dot_product", Seq(left, right))
    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(x.numElements(), y.numElements())
      val (lt, rt) = (elemType(left), elemType(right))
      var dot = 0.0; var i = 0
      while (i < n) {
        val xv = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
        dot += xv * yv; i += 1
      }
      java.lang.Double.valueOf(dot)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (lg, rg) = (elemGetter(elemType(left)), elemGetter(elemType(right)))
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += ((double) $a.$lg($i)) * ((double) $b.$rg($i));
           |}
           |${ev.value} = $dot;
           |""".stripMargin
      })
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** 64-bit SimHash over an array of 64-bit token hashes: bit b of the
    * result is set when at least half the tokens have bit b set. */
  case class SimHash64(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<bigint>, got ${other.simpleString}")
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      var m = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i); m += 1
          var b = 0
          while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        }
        i += 1
      }
      var r = 0L; var b = 0
      while (b < 64) { if (counts(b) * 2 >= m) r |= (1L << b); b += 1 }
      java.lang.Long.valueOf(r)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      nullSafeCodeGen(ctx, ev, c => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val b = ctx.freshName("b")
        val counts = ctx.freshName("counts"); val m = ctx.freshName("m")
        val h = ctx.freshName("h"); val r = ctx.freshName("r")
        s"""
           |int $n = $c.numElements();
           |int[] $counts = new int[64];
           |int $m = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i)) {
           |    long $h = $c.getLong($i); $m++;
           |    for (int $b = 0; $b < 64; $b++) { $counts[$b] += (int) (($h >>> $b) & 1L); }
           |  }
           |}
           |long $r = 0L;
           |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] * 2 >= $m) $r |= (1L << $b); }
           |${ev.value} = $r;
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** All `numHashes` Carter–Wegman minhashes in ONE pass over the hashed
    * shingle array (input: array<struct<h1:long, h2:long>>). The naive
    * formulation — numHashes separate array_min(transform(...)) — walks the
    * array through interpreted lambdas n times; this is the single biggest
    * cost in the LSH pipeline at scale, and here it collapses into one
    * codegen'd nested loop. Same algorithm bit-for-bit, so the DuckDB
    * oracle is unchanged. */
  case class MinHashSigs(child: Expression, numHashes: Int, p: Long)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sigs = Array.fill[Long](numHashes)(p)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val row = arr.getStruct(j, 2)
          val h1 = row.getLong(0); val h2 = row.getLong(1)
          var i = 0
          while (i < numHashes) {
            val v = (h1 + i * h2) % p
            if (v < sigs(i)) sigs(i) = v
            i += 1
          }
        }
        j += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sigs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      nullSafeCodeGen(ctx, ev, c => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val sigs = ctx.freshName("sigs"); val row = ctx.freshName("row")
        val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2"); val v = ctx.freshName("v")
        s"""
           |int $n = $c.numElements();
           |long[] $sigs = new long[$numHashes];
           |java.util.Arrays.fill($sigs, ${p}L);
           |for (int $j = 0; $j < $n; $j++) {
           |  if (!$c.isNullAt($j)) {
           |    org.apache.spark.sql.catalyst.InternalRow $row = $c.getStruct($j, 2);
           |    long $h1 = $row.getLong(0); long $h2 = $row.getLong(1);
           |    for (int $i = 0; $i < $numHashes; $i++) {
           |      long $v = ($h1 + $i * $h2) % ${p}L;
           |      if ($v < $sigs[$i]) $sigs[$i] = $v;
           |    }
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($sigs);
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Random-hyperplane LSH band keys for an embedding vector: computes all
    * `signs.length` hyperplane dot products in one pass (signs are ±1, so
    * each dot is a signed left-fold sum — bitwise-identical to the oracle's
    * list_reduce), thresholds them to sign bits, and packs the bits into
    * `numPlanes / bitsPerBand` band-key strings "band:bitstring". One
    * expression call per row replaces a 7000-node column-expression tree
    * that would blow up codegen at plan-build time. */
  case class HyperplaneBandKeys(child: Expression, signs: Array[Array[Double]], bitsPerBand: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_band_keys requires array<float|double>, got ${other.simpleString}")
    }
    // lazy: the child is unresolved at construction time (ColumnBridge)
    @transient private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override protected def nullSafeEval(input: Any): Any =
      keysOf(input.asInstanceOf[ArrayData])

    /** Public entry for both eval and generated code. */
    def keysOf(arr: ArrayData): ArrayData = {
      val numPlanes = signs.length
      val bits = new Array[Boolean](numPlanes)
      var i = 0
      while (i < numPlanes) {
        val w = signs(i)
        val n = math.min(arr.numElements(), w.length)
        var dot = 0.0; var j = 0
        while (j < n) {
          // null slots contribute 0 — mirrored by coalesce(...,0.0) in the
          // generated oracle SQL so both engines agree on malformed vectors
          if (!arr.isNullAt(j)) {
            val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
            dot += w(j) * x
          }
          j += 1
        }
        bits(i) = dot > 0.0
        i += 1
      }
      val numBands = numPlanes / bitsPerBand
      val keys = new Array[org.apache.spark.unsafe.types.UTF8String](numBands)
      var b = 0
      while (b < numBands) {
        val sb = new java.lang.StringBuilder(bitsPerBand + 4)
        sb.append(b).append(':')
        var r = 0
        while (r < bitsPerBand) { sb.append(if (bits(b * bitsPerBand + r)) '1' else '0'); r += 1 }
        keys(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        b += 1
      }
      ArrayData.toArrayData(keys)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // data-dependent loops over the sign matrix — delegate to the eval
      // path via reference (stays inside the whole-stage pipeline)
      val ref = ctx.addReferenceObj("hyperplaneLsh", this, classOf[HyperplaneBandKeys].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.keysOf($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Min-of-windows Karp–Rabin rolling-hash document fingerprint: one O(n)
    * pass per document (each window hash derives from the previous by one
    * multiply-add-subtract) versus O(n·k) for hashing every substring. The
    * winnowing-family fingerprint for content-defined chunking at scale. */
  case class RollingHashMin(child: Expression, window: Int)
      extends UnaryExpression with Serializable {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_hash_min requires string, got ${other.simpleString}")
    }

    // polynomial base/modulus: classic Karp–Rabin over UTF-8 bytes
    private val B = 257L
    private val M = 1000000007L

    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(hashOf(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

    /** Public entry for both eval and generated code. */
    def hashOf(s: org.apache.spark.unsafe.types.UTF8String): Long = minWindowHash(s.getBytes)

    private def minWindowHash(bytes: Array[Byte]): Long = {
      val n = bytes.length
      val k = math.min(window, math.max(n, 1))
      if (n == 0) return 0L
      // precompute B^(k-1) mod M for the roll-off term
      var pow = 1L; var i = 1
      while (i < k) { pow = pow * B % M; i += 1 }
      var h = 0L; i = 0
      while (i < k) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
      var minH = h
      while (i < n) {
        h = (h - (bytes(i - k) & 0xff) * pow % M + M * M) % M
        h = (h * B + (bytes(i) & 0xff)) % M
        if (h < minH) minH = h
        i += 1
      }
      minH
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // the per-row work is a data-dependent loop — delegate to the eval
      // path via reference (still inside whole-stage codegen's pipeline)
      val ref = ctx.addReferenceObj("rollingHash", this, classOf[RollingHashMin].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hashOf($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** All k-gram Karp–Rabin hashes of a string as array<long> — the O(n)
    * replacement for per-position md5-of-substring (O(n·k) hash work; the
    * r9 winnowing cost). Same constants and fold as RollingHashMin but
    * over Unicode CODEPOINTS, because the DuckDB oracle replays the hash
    * as `list_reduce(ords, (a, x) -> (a*257 + x) % 1000000007)` and ord()
    * yields codepoints (ASCII ⇒ identical to bytes). Window semantics
    * mirror the md5 formulation exactly: k_eff = min(k, n) (a short doc
    * hashes once over its whole text), empty text yields the single
    * sentinel hash 0 — so n_grams is unchanged at len−k+1 / 1. */
  case class KgramHashes(child: Expression, k: Int)
      extends UnaryExpression with Serializable {
    require(k >= 1, s"kgram_hashes needs k >= 1, got $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kgram_hashes requires string, got ${other.simpleString}")
    }

    private val B = 257L
    private val M = 1000000007L

    override protected def nullSafeEval(input: Any): Any =
      hashesOf(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    /** Public entry for both eval and generated code. */
    def hashesOf(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val cps = s.toString.codePoints().toArray
      val n = cps.length
      if (n == 0) return ArrayData.toArrayData(Array(0L))
      val kEff = math.min(k, n)
      val m = n - kEff + 1
      val out = new Array[Long](m)
      var pow = 1L; var i = 1
      while (i < kEff) { pow = pow * B % M; i += 1 }
      var h = 0L; i = 0
      while (i < kEff) { h = (h * B + cps(i)) % M; i += 1 }
      out(0) = h
      var p = 1
      while (p < m) {
        h = (h - cps(p - 1) * pow % M + M * M) % M
        h = (h * B + cps(p + kEff - 1)) % M
        out(p) = h
        p += 1
      }
      ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // data-dependent loop — delegate to eval via reference (stays inside
      // the whole-stage pipeline)
      val ref = ctx.addReferenceObj("kgramHashes", this, classOf[KgramHashes].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hashesOf($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Register the expressions as SQL functions on a session, then use them
    * via `expr("cosine_sim(a, b)")` — keeps call sites independent of the
    * Column constructor's visibility. */
  /** Unicode NFC normalization as a native codegen'd expression — the
    * canonicalization step BEFORE any content hash: the same visible text
    * spelled composed (é) vs decomposed (e + U+0301) yields different
    * md5s, so NFC-variant duplicates silently defeat exact dedup and
    * content-hash surrogate keys. No Spark SQL built-in exists; DuckDB's
    * nfc_normalize is the oracle counterpart (both delegate to the same
    * Unicode normalization tables). */
  case class NfcNormalize(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string, got ${other.simpleString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        |  java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC));
        |""".stripMargin)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash_min",
      es => RollingHashMin(es.head, es.lift(1)
        .map(_.eval(null).asInstanceOf[Number].intValue).getOrElse(16)), "built-in")
    reg.createOrReplaceTempFunction("kgram_hashes",
      es => KgramHashes(es.head, es.lift(1)
        .map(_.eval(null).asInstanceOf[Number].intValue).getOrElse(8)), "built-in")
  }

  def cosineSim(a: String, b: String): Column = expr(s"cosine_sim($a, $b)")
  def dotProduct(a: String, b: String): Column = expr(s"dot_product($a, $b)")
  def simhash64(c: String): Column = expr(s"simhash64($c)")
}
