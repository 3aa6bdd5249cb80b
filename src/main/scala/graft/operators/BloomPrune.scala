package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter probe pruning — the membership-join scale lever
  * SURVEY §5.1 promises for t_decontam_ngram: when a huge probe side joins
  * a comparatively small key set, build a bloom filter over the build side
  * ONCE (one aggregation pass, megabytes of driver state) and kill
  * guaranteed-miss probe rows BEFORE they pay the shuffle. False positives
  * pass through (the exact join downstream remains mandatory), false
  * negatives are impossible — so composing prune + exact join returns
  * byte-identical results while only ~fpp of the non-matching probe volume
  * reaches the exchange.
  *
  * This complements Spark's own InjectRuntimeFilter (PlanSpec pins that
  * rule on scan-to-scan joins): the optimizer rule only fires on joins
  * whose sides are scans with size statistics, while this operator works
  * on any intermediate (e.g. exploded n-grams) and makes the prune an
  * explicit, testable plan feature.
  */
object BloomPrune {

  /** Codegen'd membership probe against an immutable serialized bloom
    * filter. The filter bytes ride the plan as a reference object (one
    * task-broadcast copy per executor, deserialized lazily once). */
  case class BloomMightContainString(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression with Serializable {
    override def prettyName: String = "bloom_might_contain"
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires string, got ${other.simpleString}")
    }

    @transient private lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

    /** Case-class equality over Array[Byte] would be reference identity,
      * so two probes built from identical filters would never
      * canonicalize equal and subexpression reuse would be defeated —
      * key equality on a content digest of the filter bytes instead. */
    private lazy val filterDigest: Seq[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(filterBytes).toSeq
    override def equals(other: Any): Boolean = other match {
      case b: BloomMightContainString => child == b.child && filterDigest == b.filterDigest
      case _ => false
    }
    override def hashCode(): Int = 31 * child.hashCode() + filterDigest.hashCode()

    /** putString == putBinary(utf8 bytes) in the sketch impl, so probing
      * with the raw UTF8String bytes matches stat.bloomFilter's inserts
      * without materializing a java.lang.String per row. */
    def contains(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

    override protected def nullSafeEval(input: Any): Any =
      java.lang.Boolean.valueOf(contains(input.asInstanceOf[UTF8String]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomPrune", this, classOf[BloomMightContainString].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Build the serialized filter over `build.buildCol` (one aggregation
    * pass; size the filter from the EXPECTED distinct count — ~1.2 bytes
    * per item at fpp 0.03, so even 10⁹ train grams is ~1.2 GB, still a
    * broadcast-sized object at 100 TB corpus scale). */
  def filterFor(build: DataFrame, buildCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = build.stat.bloomFilter(buildCol, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def mightContain(c: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContainString(ColumnBridge.expression(c), filterBytes))

  /** probe rows whose `probeCol` might be in `build.buildCol` — compose
    * with the exact membership join for identical-results pruning.
    * NOTE: building the filter is an EAGER action over the build side at
    * DataFrame-construction time (stat.bloomFilter runs a job), not a
    * lazy plan node — callers sequencing work should construct the pruned
    * frame where running that job immediately is acceptable. */
  def prune(probe: DataFrame, probeCol: String, build: DataFrame, buildCol: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.03): DataFrame =
    probe.filter(mightContain(col(probeCol), filterFor(build, buildCol, expectedItems, fpp)))
}
