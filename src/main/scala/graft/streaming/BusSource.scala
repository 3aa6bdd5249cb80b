package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The MESSAGE-BUS SOURCE SEAM — the declared boundary for Kafka/Kinesis
  * (the codec-SPI precedent, SURVEY §2F, applied to §2G): every streaming
  * operator in this engine consumes a plain streaming DataFrame, so a real
  * bus plugs in as `spark.readStream.format("kafka")...` with ZERO
  * operator changes — what must be PROVEN in-repo is that the operators
  * make no assumption a bus source violates. This stub DataSourceV2
  * provider is that proof: a deterministic replayable "topic" with the
  * semantics naive pipelines break on —
  *
  *  - OFFSET-RANGE planning: each micro-batch is an exclusive [start,
  *    end) offset range planned by the engine, split across input
  *    partitions; union over batches must be exactly-once (no loss, no
  *    dup) however the ranges land;
  *  - `maxOffsetsPerTrigger`: per-trigger admission control — the stub
  *    advances `latestOffset` by at most this many records, so a backlog
  *    drains across MANY micro-batches (the Kafka option of the same
  *    name);
  *  - `startingOffset`: begin mid-topic (Kafka's startingOffsets),
  *    skipping exactly the records before it;
  *  - out-of-band records relative to event time: offsets are ARRIVAL
  *    order; event time rides the payload — watermarks must do their job
  *    on the payload column, not on offset order.
  *
  * The feed is formula-deterministic (record i: user i%97, type i%5,
  * event time base + i·90s, value nulls every 11th) so batch and stream
  * twins compare exactly. Batch read of the same "topic" is supported
  * (`spark.read.format("graftbus")`) — the kappa-backfill face.
  *
  * PERMANENT BOUNDARY: no bus client jar (spark-sql-kafka, Kinesis) is
  * vendored — zero-egress build, and connector/auth surface belongs to
  * the deployment. README §bus holds the one-jar Kafka recipe; this seam
  * + StreamBusSourceSpec is the endpoint, exactly like the codec SPI. */
class BusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftbus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BusTable(properties)
}

object BusSource {
  /** The Tables.events contract: ts is epoch NANOS as BIGINT. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  private val Types = Array("view", "click", "purchase", "signup", "refund")
  private val BaseUs = 1735689600000000L // 2025-01-01T00:00:00Z in micros
  private val StepUs = 90L * 1000 * 1000 // 90 s of event time per record

  /** Record i of the deterministic topic. */
  def row(i: Long): InternalRow = InternalRow(
    i, i % 97, UTF8String.fromString(Types((i % 5).toInt)),
    (BaseUs + i * StepUs) * 1000L,
    if (i % 11 == 0) null else (i % 1000) / 100.0)

  /** Split [from, until) into `slices` contiguous offset ranges — the
    * per-executor partition planning a bus source does per batch. */
  def plan(from: Long, until: Long, slices: Int): Array[InputPartition] = {
    val n = math.max(until - from, 0L)
    val width = math.max((n + slices - 1) / slices, 1L)
    Iterator.iterate(from)(_ + width).takeWhile(_ < until)
      .map(lo => BusSlice(lo, math.min(lo + width, until)): InputPartition)
      .toArray
  }
}

private[streaming] final case class BusSlice(from: Long, until: Long)
  extends InputPartition

private[streaming] final case class BusOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[streaming] class BusTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  // getTable receives the reader options CASE-SENSITIVELY (unlike
  // newScanBuilder's CaseInsensitiveStringMap) — normalize once
  private val props: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    properties.asScala.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
  }
  private def opt(key: String, dflt: Long): Long =
    props.get(key).map(_.toLong).getOrElse(dflt)

  override def name(): String = "graftbus"
  override def schema(): StructType = BusSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = BusSource.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          BusSource.plan(opt("startingoffset", 0L), opt("rows", 1000L), 4)
        override def createReaderFactory(): PartitionReaderFactory = BusReaderFactory
      }
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new BusMicroBatchStream(opt("rows", 1000L), opt("startingoffset", 0L),
          opt("maxoffsetspertrigger", Long.MaxValue))
    }
}

/** Offset bookkeeping face of the seam: initial → latest (admission-
  * controlled) → plan [start, end) → commit. The stream is STATELESS:
  * rate limiting runs through SupportsAdmissionControl.latestOffset(start,
  * limit) — the engine hands the source its recovered start offset, so a
  * checkpoint restart resumes exactly where the last run committed (the
  * Kafka source's contract). A mutable argless-latestOffset cursor was
  * built first and is the measured NEGATIVE result: a fresh instance's
  * cursor restarts at zero, the engine plans an end offset BEHIND the
  * recovered start, and the next batch re-covers committed ranges — the
  * file sink double-writes them under new batch ids (120 duplicated rows
  * of 300 in the restart spec). `planInputPartitions` stays a pure
  * function of the range (the topic is a formula), which is what makes
  * uncommitted-batch replay idempotent. */
private[streaming] class BusMicroBatchStream(total: Long, starting: Long,
    maxPerTrigger: Long) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private def pos(o: Offset): Long = o match {
    case BusOffset(n) => n
    case other        => other.json().toLong // engine-side serialized form
  }

  // Trigger.AvailableNow (the backfill-then-stop production pattern):
  // the engine calls prepare ONCE at query start; the offset visible at
  // that moment becomes the drain target — micro-batches advance toward
  // it under the same admission control, and the query self-terminates
  // when latestOffset stops moving (Kafka's contract; on this stub the
  // topic is static so the snapshot equals `total`, but the seam keeps
  // the real shape: a post-start append would NOT extend the run).
  @volatile private var availableNowEnd: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit = { availableNowEnd = total }
  private def target: Long = if (availableNowEnd >= 0) availableNowEnd else total

  override def initialOffset(): Offset = BusOffset(starting)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = pos(start)
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => r.maxRows()
      case _ => maxPerTrigger
    }
    BusOffset(s + math.max(math.min(step, target - s), 0L))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    BusSource.plan(pos(start), pos(end), 4)

  override def createReaderFactory(): PartitionReaderFactory = BusReaderFactory

  override def deserializeOffset(json: String): Offset = BusOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private[streaming] object BusReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val slice = partition.asInstanceOf[BusSlice]
      private var i = slice.from - 1
      override def next(): Boolean = { i += 1; i < slice.until }
      override def get(): InternalRow = BusSource.row(i)
      override def close(): Unit = ()
    }
}
