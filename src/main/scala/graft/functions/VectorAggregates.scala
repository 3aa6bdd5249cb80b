package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Decimal-exact per-dimension vector sum — ONE aggregate column for the
  * whole embedding instead of `dim` separate decimal sums.
  *
  * Why it exists: k-means centroid updates need partitioning-invariant
  * summation (doubles are order-sensitive; decimals are exact, so any
  * partitioning/merge order yields bit-identical centroids). Expressing
  * that as `dim` separate `sum(cast(vec[i] as decimal))` columns works at
  * dim=64 but generates `dim` aggregate expressions — at real embedding
  * widths (768–4096) that bloats the plan and blows past codegen limits.
  * This TypedImperativeAggregate keeps one buffer of exact decimals per
  * group, updates in a tight loop over the array, and merges
  * associatively+commutatively, so the result is invariant to partitioning
  * at ANY width with O(1) plan size.
  *
  * Each element is rounded to scale 12 on entry, ties to EVEN — the same
  * result as the oracle engine's cast to DECIMAL(38,12) (which rounds
  * half-to-even, the IEEE convention), NOT Spark SQL's HALF_UP decimal
  * cast; sums are arbitrary-precision so they cannot overflow. Output is
  * array<double> of the exact sums.
  */
case class VectorDecimalSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[JBigDecimal]] with UnaryLike[Expression] {

  private val Scale = 12

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_decimal_sum requires array<float|double>, got ${other.simpleString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[JBigDecimal] =
    Array.fill(dim)(JBigDecimal.ZERO)

  override def update(buffer: Array[JBigDecimal], input: InternalRow): Array[JBigDecimal] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
          // HALF_EVEN, not HALF_UP: float-origin values are dyadic and
          // routinely end EXACTLY on a decimal half at scale 12 (e.g.
          // 0.1983642578125), and the oracle engine's double→decimal cast
          // rounds ties to even — HALF_UP diverges by 1e-12 on every such
          // tie, which surfaces the moment a gate emits a sum-derived
          // double instead of an integer
          buffer(j) = buffer(j).add(
            JBigDecimal.valueOf(x).setScale(Scale, RoundingMode.HALF_EVEN))
        }
        j += 1
      }
    }
    buffer
  }

  override def merge(a: Array[JBigDecimal], b: Array[JBigDecimal]): Array[JBigDecimal] = {
    var j = 0
    while (j < dim) { a(j) = a(j).add(b(j)); j += 1 }
    a
  }

  override def eval(buffer: Array[JBigDecimal]): Any =
    new GenericArrayData(buffer.map(_.doubleValue()))

  override def serialize(buffer: Array[JBigDecimal]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var j = 0
    while (j < dim) {
      // fixed scale — only the unscaled integer needs to travel
      val bytes = buffer(j).setScale(Scale).unscaledValue().toByteArray
      out.writeInt(bytes.length); out.write(bytes)
      j += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): Array[JBigDecimal] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    Array.fill(dim) {
      val bytes = new Array[Byte](in.readInt()); in.readFully(bytes)
      new JBigDecimal(new BigInteger(bytes), Scale)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorDecimalSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorDecimalSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorDecimalSum =
    copy(child = newChild)
}

/** Misra–Gries frequent-items sketch over a string column — the bounded-
  * memory pass-1 of the two-pass heavy-hitters pattern: each partial
  * aggregation keeps at most k counters regardless of cardinality, merges
  * are the mergeable-summaries combine (sum, then subtract the (k+1)-th
  * largest count and drop non-positives), and the output is the candidate
  * token set plus the exact total item count. GUARANTEE (order- and
  * partitioning-independent): every item with true frequency > N/(k+1)
  * survives in the candidate set — counter VALUES are order-dependent, so
  * only candidates + total are exposed; an exact re-count over the (≤ k)
  * candidates then yields a deterministic final answer.
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Buffer] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("cands", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires string, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): FreqSketch.Buffer = new FreqSketch.Buffer()

  override def update(b: FreqSketch.Buffer, input: InternalRow): FreqSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.toString
      b.total += 1L
      val cur = b.counts.getOrElse(tok, 0L)
      if (cur > 0L || b.counts.size < k) b.counts.update(tok, cur + 1L)
      else {
        // classic MG decrement-all step; amortized O(1) per item
        val dead = b.counts.iterator.flatMap { case (t, c) =>
          if (c == 1L) Some(t) else { b.counts.update(t, c - 1L); None }
        }.toList
        dead.foreach(b.counts.remove)
      }
    }
    b
  }

  override def merge(a: FreqSketch.Buffer, b: FreqSketch.Buffer): FreqSketch.Buffer = {
    a.total += b.total
    b.counts.foreach { case (t, c) => a.counts.update(t, a.counts.getOrElse(t, 0L) + c) }
    if (a.counts.size > k) {
      val cut = a.counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = a.counts.iterator.flatMap { case (t, c) =>
        if (c - cut <= 0L) Some(t) else { a.counts.update(t, c - cut); None }
      }.toList
      dead.foreach(a.counts.remove)
    }
    a
  }

  override def eval(b: FreqSketch.Buffer): Any = {
    val toks = b.counts.keysIterator.toArray.sorted
      .map(org.apache.spark.unsafe.types.UTF8String.fromString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](b.total, ArrayData.toArrayData(toks)))
  }

  override def serialize(b: FreqSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.total); out.writeInt(b.counts.size)
    b.counts.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new FreqSketch.Buffer()
    b.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { b.counts.update(in.readUTF(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
}

object FreqSketch {
  final class Buffer {
    var total: Long = 0L
    val counts: scala.collection.mutable.HashMap[String, Long] =
      scala.collection.mutable.HashMap.empty
  }
}

/** KMV (k-minimum-values) distinct sketch — bounded-state approximate
  * COUNT(DISTINCT) whose sketches MERGE (union = merge, so per-partition /
  * per-day sketches roll up without touching raw data, the property
  * approx_count_distinct shares but an exact distinct lacks).
  *
  * The aggregate keeps the k smallest DISTINCT hash values seen (input is a
  * pre-hashed long — hashing stays in the query layer, md5-based, so the
  * DuckDB oracle reproduces the sketch exactly; no RNG anywhere). With
  * hashes uniform on [0, 2^60) (15 md5 hex digits), the k-th smallest value
  * v estimates the distinct count as (k-1)·2^60 / v; fewer than k distinct
  * hashes means the sketch IS the exact distinct set. Standard error
  * ≈ 1/√(k−2).
  *
  * State is O(k) under any partitioning; update is O(log k) (sorted set
  * with early reject against the current k-th). eval returns the sorted
  * sketch itself so callers derive estimates, set unions, or Jaccard
  * overlaps (|KMV(A∪B) ∩ KMV(A) ∩ KMV(B)| / k) from it.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a long hash column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(b: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (b.size < k) { b.add(h); () }
    else if (h < b.last()) { if (b.add(h)) { b.remove(b.last()); () } }

  override def update(b: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    ArrayData.toArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new java.util.TreeSet[java.lang.Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) { b.add(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}
