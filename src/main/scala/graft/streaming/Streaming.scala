package graft.streaming

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2G).
  *
  * Both operators are written as transformations applicable to a batch OR
  * streaming DataFrame — the Structured Streaming contract — so the driver's
  * batch oracle validates the same code the streaming specs run with
  * watermarks + memory sinks.
  */
object Streaming {

  /** Shared windowed-aggregation core: `ts` arrives as nanosecond longs;
    * event time is derived micros-exact; sums follow the decimal
    * convention. Works unchanged on a readStream source (append mode after
    * watermark). One definition serves tumbling and sliding so batch/
    * stream parity cannot diverge between them. */
  private def windowedAgg(events: DataFrame, duration: String, slide: String,
      outCol: String, withWatermark: Boolean): DataFrame = {
    val withTs = events
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    val wm = if (withWatermark) withTs.withWatermark("event_time", "2 hours") else withTs
    wm.groupBy(window(col("event_time"), duration, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as(outCol), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Watermarked hourly (tumbling) windowed aggregation. */
  def hourlyAgg(events: DataFrame, withWatermark: Boolean): DataFrame =
    windowedAgg(events, "1 hour", "1 hour", "hour_start_us", withWatermark)

  /** Sliding-window aggregation (2 h windows advancing hourly): every
    * event contributes to TWO windows — the smoothing shape for rate/
    * trend monitors. */
  def slidingAgg(events: DataFrame, withWatermark: Boolean): DataFrame =
    windowedAgg(events, "2 hours", "1 hour", "win_start_us", withWatermark)

  /** Per-hour FIXED-BIN QUANTILE SKETCH — the q_sketch_quantile store
    * rollup as a streaming state shape: each hour's state is O(buckets)
    * integer counters per event type, windows emit mergeable sketch rows
    * on watermark close, and a downstream reader answers any percentile
    * over any hour span from the stored rows alone. The bin layout
    * (lo, w, buckets) is PINNED up front — a streaming job cannot run a
    * bounds pass, which is exactly the metric-contract form
    * q_sketch_quantile's store path prescribes for production; values
    * outside the pinned range clamp into the edge buckets. */
  def hourlySketch(events: DataFrame, withWatermark: Boolean,
      lo: Long, w: Long, buckets: Int): DataFrame = {
    val withTs = events
      .filter(col("value").isNotNull)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withColumn("x6",
        (col("value").cast("decimal(18,6)") * lit(1000000L)).cast("long"))
      .withColumn("x6c",
        greatest(lit(lo), least(col("x6"), lit(lo + w * buckets - 1))))
      .withColumn("bucket", expr(s"(x6c - $lo) div $w"))
    val wm = if (withWatermark) withTs.withWatermark("event_time", "2 hours")
      else withTs
    wm.groupBy(window(col("event_time"), "1 hour"), col("event_type"),
        col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("hour_start_us"),
        col("event_type"), col("bucket"), col("cnt"))
  }

  /** Per-window top-k event types: the rank step over the windowed-count
    * aggregate (hourlyAgg's output shape). The aggregate is the stateful
    * streaming part; ranking within an hour is stateless once that hour's
    * counts exist — in streaming, ride it in foreachBatch over the
    * watermark-closed windows (each hour emits exactly once, so ranking
    * its final counts is replay-safe; StreamingSpec drives this). State
    * stays bounded by the watermark; the rank window partitions by hour,
    * so at 100 TB no single-partition global sort ever forms. */
  def hourlyTopK(counts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_start_us")).orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("hour_start_us"), col("event_type"), col("n"), col("rnk"))
  }

  /** Stream-static enrichment: events joined to a STATIC dimension (the
    * stream-static join — stateless, re-planned per micro-batch so the
    * dimension can be swapped between batches), then the watermarked
    * hourly aggregate rolls up per segment. At scale the static side
    * broadcasts — the stream never shuffles for the enrichment; the only
    * stateful operator is the windowed aggregate, bounded by the
    * watermark. Works identically on a batch DataFrame (the gate). */
  def enrichedHourly(events: DataFrame, dim: DataFrame,
      withWatermark: Boolean): DataFrame = {
    val withTs = events
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .join(broadcast(dim), Seq("user_id")) // static side: broadcast, stateless
    val wm = if (withWatermark) withTs.withWatermark("event_time", "2 hours") else withTs
    wm.groupBy(window(col("event_time"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_start_us"), col("segment"),
        col("n"), col("sum_value"))
  }

  /** Streaming METRIC-ANOMALY flags: the alerting monitor a production
    * stream runs against a historical baseline — watermarked hourly
    * per-type counts joined to a STATIC per-(event_type, hour-of-day)
    * baseline table (stream-static broadcast, stateless like
    * enrichedHourly's dim), flagged when the live count leaves the
    * [0.5×, 1.5×] band of the baseline MEAN. The band test is EXACT
    * integer arithmetic — n < tot/(2·days) ⇔ 2·n·days < tot and
    * n > 3·tot/(2·days) ⇔ 2·n·days > 3·tot — so batch and stream (and
    * engine and oracle) cannot disagree by a rounding hair.
    *
    * Baseline columns: event_type, hod, base_tot (Σ counts over the
    * baseline period), base_days (days observed). The only stateful
    * operator is the windowed count, watermark-bounded; the baseline
    * broadcast re-plans per micro-batch so a refreshed baseline table
    * picks up without restart. */
  def anomalyFlags(events: DataFrame, baseline: DataFrame,
      withWatermark: Boolean): DataFrame =
    hourlyAgg(events, withWatermark)
      .withColumn("hod", expr("(hour_start_us div 3600000000) % 24"))
      .join(broadcast(baseline), Seq("event_type", "hod"))
      .select(col("hour_start_us"), col("event_type"), col("n"),
        col("base_tot"), col("base_days"),
        (col("n") * col("base_days") * 2 < col("base_tot") ||
          col("n") * col("base_days") * 2 > col("base_tot") * 3).as("is_anomaly"))

  final case class Ev(user_id: Long, ts_us: Long, value: Double,
      event_time: java.sql.Timestamp = null)
  final case class St(idx: Long, buffer: List[Ev])
  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long, sum_value: Double)

  val GapUs: Long = 30L * 60 * 1000000

  /** Session accumulator shared by the batch and streaming paths. Sums run
    * in DECIMAL(18,6) (BigDecimal) in event order, matching the engine-wide
    * decimal summation convention bit-for-bit. */
  private def sessionsOf(events: Iterator[Ev], firstIdx: Long): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.user_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Seq.newBuilder[Session]
      var idx = firstIdx; var start = sorted.head.ts_us; var last = start
      var n = 0L; var sum = JBigDecimal.ZERO
      def emit(uid: Long): Unit =
        out += Session(uid, idx, n, start, last, sum.doubleValue())
      for (e <- sorted) {
        if (n > 0 && e.ts_us - last > GapUs) {
          emit(e.user_id); idx += 1
          start = e.ts_us; n = 0; sum = JBigDecimal.ZERO
        }
        n += 1; last = e.ts_us
        sum = sum.add(new JBigDecimal(e.value).setScale(6, java.math.RoundingMode.HALF_UP))
      }
      emit(sorted.head.user_id)
      out.result().iterator
    }
  }

  /** Batch path: gap-based sessionization via typed groups. One shuffle on
    * user_id; per-group logic identical to the stateful streaming path. */
  def sessionizeBatch(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    events.withColumn("ts_us", expr("ts div 1000"))
      .select(col("user_id"), col("ts_us"), col("value"),
        lit(null).cast("timestamp").as("event_time")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups((_: Long, it: Iterator[Ev]) => sessionsOf(it, firstIdx = 1L))
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks in the preceding hour. Works on batch AND streaming inputs —
    * with watermarks, Spark bounds both join states by the interval, so
    * state never grows past (watermark delay + interval) per side. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      withWatermark: Boolean, joinType: String = "inner"): DataFrame = {
    def prep(df: DataFrame, prefix: String): DataFrame = {
      val t = df.withColumn(s"${prefix}_ts_us", expr("ts div 1000"))
        .withColumn(s"${prefix}_time", timestamp_micros(col(s"${prefix}_ts_us")))
        .select(col("user_id").as(s"${prefix}_user"), col("event_id").as(s"${prefix}_id"),
          col(s"${prefix}_ts_us"), col(s"${prefix}_time"))
      if (withWatermark) t.withWatermark(s"${prefix}_time", "30 minutes") else t
    }
    val p = prep(purchases, "p")
    val c = prep(clicks, "c")
    // left_outer keeps unmatched purchases with NULL click columns — in
    // streaming mode the NULL side emits only once the watermark passes
    // the purchase's join window (state is provably complete), the
    // semantics StreamingSpec's outer parity test pins with sentinels
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_time") >= col("p_time") - expr("INTERVAL 1 HOUR") &&
        col("c_time") <= col("p_time"),
      joinType)
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        (col("p_ts_us") - col("c_ts_us")).as("gap_us"))
  }

  /** Streaming exact dedup: event-time watermarked duplicate drop by id.
    * State holds one entry per id only within the watermark horizon — the
    * streaming half of the exact-dedup operator (§2D). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch equivalent of dedupStream for an at-least-once feed whose
    * redeliveries are bit-identical copies: one row per event_id. (With
    * identical copies the kept-row choice cannot affect the result, so
    * this is deterministic — the st_dedup gate relies on it.) */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** One Holt update step in exact integer units — the Scala twin of the
    * SQL fold in queries.Events.holtFold (α=1/2, β=1/4, half-up integer
    * division, sign-symmetric). Shared by the streaming forecaster and
    * the StreamingSpec parity test so the online path can never drift
    * from the batch gate. */
  def holtStep(level: Long, trend: Long, x: Long): (Long, Long) = {
    def halfUp(v: Long, d: Long): Long =
      if (v >= 0) (2 * v + d) / (2 * d) else -((-2 * v + d) / (2 * d))
    val l2 = halfUp(x + level + trend, 2)
    val t2 = halfUp(l2 - level + 3 * trend, 4)
    (l2, t2)
  }

  /** Fold a closed, ascending series prefix through Holt, carrying state
    * — (level, trend) after x₁, x₂ initialization, or a prior carry. */
  def holtFoldSeries(init: Option[(Long, Long)], xs: Seq[Long]): Option[(Long, Long)] =
    init match {
      case Some(st) => Some(xs.foldLeft(st) { case ((l, t), x) => holtStep(l, t, x) })
      case None if xs.size >= 2 =>
        // init (x₁, x₂−x₁), then fold x₂..xn INCLUDING x₂ — exactly the
        // SQL fold's slice(revs, 2, size−1). (An xs.drop(2) variant
        // shipped first and diverged on short series: the contraction
        // hides the off-by-one on long ones, which is why only an
        // exact-value check on a 3-point series catches it.)
        Some(xs.drop(1).foldLeft((xs.head, xs(1) - xs.head)) {
          case ((l, t), x) => holtStep(l, t, x)
        })
      case None => None // need two points to initialize level/trend
    }

  final case class CepEv(user_id: Long, event_id: Long, ts_us: Long,
      is_b: Boolean, event_time: java.sql.Timestamp)
  final case class CepMatch(user_id: Long, a_id: Long, b_id: Long, latency_us: Long)
  final case class CepSt(pending: List[(Long, Long)], buffer: List[CepEv])

  /** CEP first-match window: a click matches the FIRST purchase strictly
    * after it within this horizon. */
  val CepWindowUs: Long = 30L * 60 * 1000000

  /** The CEP matcher shared by the batch and streaming paths: scan events
    * in (ts, event_id) order carrying the pending-click set; a purchase
    * matches (and CONSUMES) every pending click within the window — for
    * each click that is provably its FIRST purchase-after, the semantics
    * a pattern engine's strict-contiguity-free SELECT A->B WITHIN T
    * compiles to; clicks expire silently past the window. Resumable: the
    * surviving pending set is the ONLY state a prefix hand-off needs
    * (processed purchases never matter again), which is what keeps the
    * streaming state O(clicks-in-window) per user. */
  private def cepOf(events: Seq[CepEv], pendingIn: List[(Long, Long)])
      : (List[CepMatch], List[(Long, Long)]) = {
    val out = List.newBuilder[CepMatch]
    var pending = pendingIn // (a_id, a_ts) — ascending ts
    for (e <- events.sortBy(ev => (ev.ts_us, ev.event_id))) {
      if (e.is_b) {
        pending = pending.filter(_._2 > e.ts_us - CepWindowUs) // expire
        val (hit, stay) = pending.partition(_._2 < e.ts_us)    // strict after
        hit.foreach { case (aId, aTs) =>
          out += CepMatch(e.user_id, aId, e.event_id, e.ts_us - aTs) }
        pending = stay
      } else {
        pending = pending.filter(_._2 > e.ts_us - CepWindowUs) :+ ((e.event_id, e.ts_us))
      }
    }
    (out.result(), pending)
  }

  private def cepEvents(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin("click", "purchase"))
      .withColumn("ts_us", expr("ts div 1000"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        (col("event_type") === "purchase").as("is_b"),
        timestamp_micros(col("ts_us")).cast("timestamp").as("event_time"))

  /** Batch face of the CEP operator: one user-keyed shuffle, per-group
    * matcher run over the full history with an empty initial pending set. */
  def cepBatch(spark: SparkSession, events: DataFrame): Dataset[CepMatch] = {
    import spark.implicits._
    cepEvents(events).as[CepEv]
      .groupByKey(_.user_id)
      .flatMapGroups((_: Long, it: Iterator[CepEv]) => cepOf(it.toSeq, Nil)._1.iterator)
  }

  /** Streaming path: flatMapGroupsWithState with event-time timeout.
    * Events buffer per user until the watermark proves their prefix
    * complete (a purchase may only match once no earlier click can still
    * arrive); the matcher then runs on the closed prefix and hands its
    * surviving pending-click set forward — state is the open buffer plus
    * O(window) pending clicks, never full history. */
  def cepStream(spark: SparkSession, events: DataFrame): Dataset[CepMatch] = {
    import spark.implicits._
    cepEvents(events)
      .withWatermark("event_time", "30 minutes")
      .as[CepEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepSt, CepMatch](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[CepEv], state: GroupState[CepSt]) =>
          val st = state.getOption.getOrElse(CepSt(Nil, Nil))
          val buf = (st.buffer ++ it.toList).sortBy(e => (e.ts_us, e.event_id))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val (closed, open) = buf.partition(_.ts_us <= wmUs)
          val (matches, pending0) = cepOf(closed, st.pending)
          // expire pending clicks the watermark has passed out of the
          // match window: no future purchase (ts > wm) can reach them,
          // and without this a user whose stream ends on an unmatched
          // click would re-arm its timeout and hold state forever
          val pending = pending0.filter(_._2 + CepWindowUs > wmUs)
          if (open.isEmpty && pending.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(CepSt(pending, open))
            // wake when the watermark passes the open prefix (or the last
            // pending click's expiry) so the tail flushes without new
            // input; Spark requires the timeout to sit beyond the current
            // watermark, so clamp
            val deadline = (open.map(_.ts_us) ++ pending.map(_._2 + CepWindowUs))
              .max / 1000 + 1
            state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1))
          }
          matches.iterator
      }
  }

  /** Streaming path: flatMapGroupsWithState with EVENT-time timeout.
    * Gap-closed sessions flush as soon as the closing event arrives; the
    * trailing open session stays in state until the watermark passes its
    * (end + gap) deadline, then flushes via timeout — the textbook
    * watermark-driven sessionization, deterministic and replay-safe. */
  def sessionizeStream(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    events.withColumn("ts_us", expr("ts div 1000"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "30 minutes")
      .select(col("user_id"), col("ts_us"), col("value"), col("event_time")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Session](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[St]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's deadline: it is final
            val st = state.get
            state.remove()
            sessionsOf(st.buffer.iterator, st.idx)
          } else {
            val st = state.getOption.getOrElse(St(1L, Nil))
            val sorted = (st.buffer ++ it.toList).sortBy(_.ts_us)
            val closedAt = sorted.zip(sorted.drop(1))
              .lastIndexWhere { case (a, b) => b.ts_us - a.ts_us > GapUs }
            val (emitted, open) =
              if (closedAt < 0) (Nil, sorted)
              else {
                val (c, o) = sorted.splitAt(closedAt + 1)
                (sessionsOf(c.iterator, st.idx).toList, o)
              }
            state.update(St(st.idx + emitted.size, open))
            state.setTimeoutTimestamp(open.last.ts_us / 1000 + GapUs / 1000 + 1)
            emitted.iterator
          }
      }
  }
}
