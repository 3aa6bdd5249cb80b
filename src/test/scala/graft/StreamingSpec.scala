package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** Runs the §2G operators as REAL streaming queries (file source → memory
  * sink) and checks them against their batch formulations. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  /** File streaming sources need a directory; stage the events table
    * through Tables.events so `ts` is the normalized BIGINT-nanos column
    * whatever the source parquet's physical timestamp type. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    Tables.events(spark, dir).coalesce(1).write.mode("overwrite").parquet(d.toString)
    d.toString
  }
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("watermarked hourly window agg: streaming result == batch result") {
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val q = Streaming.hourlyAgg(stream, withWatermark = true)
      .writeStream.outputMode("append").format("memory").queryName("hourly_out").start()
    try { q.processAllAvailable() } finally q.stop()
    // append mode only emits windows the watermark has passed; with one
    // micro-batch that is every window except those within the 2h watermark
    // of max event time — compare on the emitted subset
    val streamed = spark.table("hourly_out")
      .select("hour_start_us", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Streaming.hourlyAgg(Tables.events(spark, dir), withWatermark = false)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "watermark must have closed some windows")
    assert(streamed.subsetOf(batch), "every emitted window must match the batch result")
  }

  test("watermarked hourly quantile sketch: streamed sketch rows == batch sketch rows") {
    import graft.queries.Modal4.{StQLo, StQW, StQBuckets}
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val q = Streaming.hourlySketch(stream, withWatermark = true,
        StQLo, StQW, StQBuckets)
      .writeStream.outputMode("append").format("memory").queryName("sketch_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sketch_out")
      .select("hour_start_us", "event_type", "bucket", "cnt")
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = Streaming.hourlySketch(Tables.events(spark, dir),
        withWatermark = false, StQLo, StQW, StQBuckets)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed.nonEmpty, "watermark must have closed some windows")
    assert(streamed.subsetOf(batch),
      "every emitted (hour, type, bucket) counter must match the batch sketch")
    // the streaming state really is O(B) per (hour, type): no bucket id
    // outside the pinned layout may ever appear
    assert(streamed.forall { case (_, _, b, _) => b >= 0 && b < StQBuckets })
  }

  test("streaming metric anomaly: watermark-closed flags match the batch band rule") {
    val ev = Tables.events(spark, dir).withColumn("us", expr("ts div 1000"))
    val day = expr("us div 86400000000")
    // static baseline from the even epoch-days, persisted like a real
    // baseline table would be
    val baseDir = java.nio.file.Files.createTempDirectory("anomaly-base").toString
    ev.filter(day % 2 === 0)
      .select(col("event_type"), expr("(us div 3600000000) % 24").as("hod"), day.as("d"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("base_tot"), countDistinct(col("d")).as("base_days"))
      .write.mode("overwrite").parquet(baseDir)
    val baseline = spark.read.parquet(baseDir)
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
      .filter(expr("(ts div 1000) div 86400000000") % 2 === 1)
    val q = Streaming.anomalyFlags(stream, baseline, withWatermark = true)
      .writeStream.outputMode("append").format("memory").queryName("anomaly_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("anomaly_out")
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSet
    val batch = Streaming.anomalyFlags(
        Tables.events(spark, dir).filter(expr("(ts div 1000) div 86400000000") % 2 === 1),
        baseline, withWatermark = false)
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSet
    assert(streamed.nonEmpty, "watermark must have closed some windows")
    assert(streamed.subsetOf(batch), "every emitted flag row must match batch")
    assert(batch.exists(_._6) && batch.exists(!_._6),
      "both verdicts must be exercised by the split")
  }

  test("streaming hourly top-k: ranking watermark-closed windows matches batch") {
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val ranked = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q = Streaming.hourlyAgg(stream, withWatermark = true)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // append mode emits each closed window exactly once and completely,
        // so its final counts are all present in this batch — rank is safe
        ranked ++= Streaming.hourlyTopK(b, 3).collect().map(_.toSeq); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val batch = Streaming.hourlyTopK(
      Streaming.hourlyAgg(Tables.events(spark, dir), withWatermark = false), 3)
      .collect().map(_.toSeq).toSet
    assert(ranked.nonEmpty, "watermark must have closed some windows")
    assert(ranked.forall(batch.contains),
      "every streamed window's top-k must match the batch ranking")
    val keys = ranked.map(r => (r.head, r(3)))
    assert(keys.distinct.size == keys.size, "no (hour, rank) may emit twice")
  }

  test("stream-static enrichment: broadcast dim join + windowed agg matches batch") {
    val ev = Tables.events(spark, dir)
    val dimDir = java.nio.file.Files.createTempDirectory("enrich-dim").toString
    ev.select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg_"), col("user_id") % 4))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir) // STATIC side, from disk
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val q = Streaming.enrichedHourly(stream, dim, withWatermark = true)
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enrich_out")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Streaming.enrichedHourly(ev, dim, withWatermark = false)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "watermark must have closed some windows")
    assert(streamed.subsetOf(batch), "every emitted enriched window must match batch")
  }

  test("streaming CDC: micro-batch foldState converges to the batch compaction, any batching") {
    import graft.operators.CdcApply
    val changelog = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("op",
        when(col("event_type") === "signup", CdcApply.Insert)
          .when(col("event_type") === "purchase", CdcApply.Update)
          .when(col("event_type") === "error", CdcApply.Delete))
      .select("user_id", "op", "ts_us", "event_id", "value")
    // three files, streamed one per micro-batch (discovery order arbitrary
    // — the fold's max-wins reduction must not care)
    val d = java.nio.file.Files.createTempDirectory("cdc-stream")
    changelog.filter(col("event_id") % 3 === 0).coalesce(1).write.parquet(s"$d/f0")
    changelog.filter(col("event_id") % 3 === 1).coalesce(1).write.parquet(s"$d/f1")
    changelog.filter(col("event_id") % 3 === 2).coalesce(1).write.parquet(s"$d/f2")
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = spark.readStream.schema(changelog.schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$d/f*")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // localCheckpoint truncates the per-fold lineage (same pattern as
        // the IncrementalAgg foreachBatch spec)
        state = Some(CdcApply.foldState(state, b,
          Seq("user_id"), "op", "ts_us", "event_id", Seq("value")).localCheckpoint())
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val streamed = CdcApply.liveView(state.get, Seq("user_id"), "op", "ts_us", Seq("value"))
      .collect().map(_.toSeq).toSet
    val batch = CdcApply(changelog, Seq("user_id"), "op", "ts_us", "event_id", Seq("value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streamed CDC state diverged: ${streamed.size} vs ${batch.size} rows")
  }

  test("streaming store: foreachBatch upserts windowed aggregates into JDBC, replay-safe") {
    // the streaming face of the reference's store flow: watermark-closed
    // hourly windows land in the database through the staged upsert sink;
    // keyed upserts make redelivered micro-batches converge instead of
    // duplicating (the at-least-once → effectively-once bridge)
    import graft.sources.JdbcUpsertSink
    import java.sql.DriverManager
    val url = "jdbc:derby:memory:streamdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate("DROP TABLE hourly_t") catch { case _: Exception => () }
      conn.createStatement().executeUpdate(
        """CREATE TABLE hourly_t (hour_start_us BIGINT, event_type VARCHAR(32),
          |  n BIGINT, sum_value DOUBLE,
          |  PRIMARY KEY (hour_start_us, event_type))""".stripMargin.replace("\n", " "))
    } finally conn.close()
    val cfg = JdbcUpsertSink.Config(url, "hourly_t", Seq("hour_start_us", "event_type"))
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    def run(): Unit = {
      val q = Streaming.hourlyAgg(stream, withWatermark = true)
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          JdbcUpsertSink.upsertViaStaging(b, cfg); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    def rows(): Set[(Long, String, Long, Double)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT hour_start_us, event_type, n, sum_value FROM hourly_t")
        Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4))).toSet
      } finally c.close()
    }
    val afterRun1 = rows()
    assert(afterRun1.nonEmpty, "closed windows must have landed in the database")
    val batch = Streaming.hourlyAgg(Tables.events(spark, dir), withWatermark = false)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(afterRun1.subsetOf(batch), "every stored window must match the batch result")
    // replay the whole stream (no checkpoint): keyed upserts converge
    run()
    assert(rows() == afterRun1, "a replayed stream must not duplicate or drift rows")
  }

  test("checkpoint restart: state recovers, windows emit exactly once across runs") {
    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts div 1000"))
    val mid = ev.agg(expr("percentile(ts_us, 0.5)")).head().getDouble(0).toLong
    val d = java.nio.file.Files.createTempDirectory("events-restart")
    val ckpt = java.nio.file.Files.createTempDirectory("events-ckpt").toString
    val schema = StructType(eventsSchema.fields :+ StructField("ts_us", LongType))
    ev.filter(col("ts_us") <= mid).coalesce(1).write.parquet(s"$d/f1")

    val emitted = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    def run(): Unit = {
      val q = Streaming.hourlyAgg(
        spark.readStream.schema(schema).parquet(s"$d/f*"), withWatermark = true)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted ++= b.collect().map(_.toSeq); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val afterRun1 = emitted.size
    assert(afterRun1 > 0, "first run must close some windows")
    // second half arrives while the query is DOWN; restart from checkpoint
    ev.filter(col("ts_us") > mid).coalesce(1).write.parquet(s"$d/f2")
    run()
    assert(emitted.size > afterRun1, "restarted run must close more windows")
    val keys = emitted.map(r => (r.head, r(1)))
    assert(keys.distinct.size == keys.size,
      "a window emitted twice across restart — checkpoint state was lost")
    val batch = Streaming.hourlyAgg(Tables.events(spark, dir), withWatermark = false)
      .collect().map(_.toSeq).toSet
    assert(emitted.forall(batch.contains), "every emitted window must match batch")
  }

  test("watermarked sliding window agg: every emitted window matches batch") {
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val q = Streaming.slidingAgg(stream, withWatermark = true)
      .writeStream.outputMode("append").format("memory").queryName("sliding_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sliding_out")
      .select("win_start_us", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Streaming.slidingAgg(Tables.events(spark, dir), withWatermark = false)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "watermark must have closed some windows")
    assert(streamed.subsetOf(batch), "every emitted window must match the batch result")
  }

  test("stream-stream interval join matches the batch formulation") {
    val p = spark.readStream.schema(eventsSchema).parquet(streamDir)
      .filter(col("event_type") === "purchase")
    val c = spark.readStream.schema(eventsSchema).parquet(streamDir)
      .filter(col("event_type") === "click")
    val q = Streaming.purchaseClickJoin(p, c, withWatermark = true)
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("ssj_out")
      .select("p_id", "c_id", "gap_us").as[(Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, dir)
    val batch = Streaming.purchaseClickJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"), withWatermark = false)
      .select("p_id", "c_id", "gap_us").as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty && streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("stream-stream LEFT OUTER interval join: null-side rows emit once the watermark closes their window") {
    // sentinel events far past every real event push the watermark beyond
    // all real purchases' join windows, so the no-data batch flushes their
    // outer (NULL-click) results — without the sentinels the trailing
    // purchases' state would never provably close and the outer rows
    // would be withheld, which is exactly the semantics under test
    val d = java.nio.file.Files.createTempDirectory("events-outer")
    val ev = Tables.events(spark, dir)
    ev.coalesce(1).write.parquet(s"$d/real")
    val far = ev.agg(max(col("ts"))).as[Long].head() + 100L * 3600 * 1000 * 1000 * 1000
    Seq((-1L, far, -999L, "purchase", 0.0, "{}"), (-2L, far, -999L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/sentinel")
    val batch = Streaming.purchaseClickJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        withWatermark = false, joinType = "left_outer")
      .select("p_id", "c_id", "gap_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(batch.exists(_._2.isEmpty), "fixture must contain unmatched purchases")
    // maxFilesPerTrigger=1 pins the batch order (real data, then the
    // sentinel) so both file sources advance in lockstep
    val src = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString + "/*")
    val q = Streaming.purchaseClickJoin(
        src.filter(col("event_type") === "purchase"),
        src.filter(col("event_type") === "click"),
        withWatermark = true, joinType = "left_outer")
      .writeStream.outputMode("append").format("memory").queryName("ssoj_out").start()
    try {
      q.processAllAvailable()
      // the outer (NULL-side) flush rides a NO-DATA micro-batch after the
      // last data batch — processAllAvailable doesn't wait for it, so
      // poll until the emitted row count reaches the batch answer
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("ssoj_out").filter(col("user_id") =!= -999L).count() < batch.size
          && System.nanoTime() < deadline)
        Thread.sleep(200)
    } finally q.stop()
    val streamed = spark.table("ssoj_out").filter(col("user_id") =!= -999L)
      .select("p_id", "c_id", "gap_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"(missing outer rows: ${(batch -- streamed).take(3)})")
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    // stage the same normalized table twice -> every event arrives duplicated
    val d = java.nio.file.Files.createTempDirectory("events-dup")
    val ev0 = Tables.events(spark, dir)
    ev0.coalesce(1).write.parquet(s"$d/a")
    ev0.coalesce(1).write.parquet(s"$d/b")
    val stream = spark.readStream.schema(eventsSchema).parquet(d.toString + "/*")
    val q = Streaming.dedupStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val n = spark.table("dedup_out").count()
    val expected = Tables.events(spark, dir).count()
    assert(n == expected, s"got $n, want $expected (duplicates must collapse)")
  }

  test("foreachBatch + IncrementalAgg: streamed micro-batch refreshes converge to the batch aggregate") {
    // the streaming face of e_agg_refresh: per-user (count, exact decimal
    // sum, max ts) state folded batch-by-batch, never rescanning history
    val d = java.nio.file.Files.createTempDirectory("events-incr")
    val ev = Tables.events(spark, dir).withColumn("ts_us", expr("ts div 1000"))
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$d/f1")
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$d/f2")
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("v"),
        max(col("ts_us")).as("hi"))
    val spec = Seq("n" -> "sum", "v" -> "sum", "hi" -> "max")
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var batches = 0
    val q = spark.readStream.schema(
      StructType(eventsSchema.fields :+ StructField("ts_us", LongType)))
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/*")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val p = partial(batch)
        state = Some(state.fold(p)(st =>
          graft.operators.IncrementalAgg.merge(st, p, Seq("user_id"), spec))
          .localCheckpoint())
        batches += 1
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 2, s"expected multiple micro-batches, got $batches")
    val got = state.get.orderBy("user_id").collect().map(_.toSeq).toSeq
    val want = partial(ev).orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got == want, s"incremental state diverged: got=${got.take(3)} want=${want.take(3)}")
  }

  test("foreachBatch + ViewDelta.refresh: a changelog stream WITH DELETES maintains the join view") {
    // the streaming face of e_view_delta_del: each micro-batch carries
    // inserts AND deletes for the A side; the view refreshes via the
    // anti-join retraction terms and must equal a from-scratch re-join of
    // the final sides — without ever re-joining them during the run
    import graft.operators.ViewDelta
    val d = java.nio.file.Files.createTempDirectory("viewdelta-stream")
    // static B side; A starts {1, 3} and the changelog inserts 2/5,
    // deletes 3, then re-inserts 3 under a new value and deletes 1
    val b = Seq((1, "b1"), (2, "b2"), (3, "b3"), (5, "b5")).toDF("k", "bv").localCheckpoint()
    var a = Seq((1, "a1"), (3, "a3")).toDF("k", "av").localCheckpoint()
    var view = a.join(b, Seq("k")).localCheckpoint()
    Seq(("I", 2, "a2"), ("D", 3, "")).toDF("op", "k", "av")
      .coalesce(1).write.parquet(s"$d/f1")
    Seq(("I", 3, "a3n"), ("I", 5, "a5"), ("D", 1, "")).toDF("op", "k", "av")
      .coalesce(1).write.parquet(s"$d/f2")
    val bNoIns = b.filter(lit(false))
    val bNoDel = b.select(col("k")).filter(lit(false))
    var batches = 0
    val q = spark.readStream.schema(StructType(Seq(
        StructField("op", StringType), StructField("k", IntegerType),
        StructField("av", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/*")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ins = batch.filter(col("op") === "I").select(col("k"), col("av"))
        val del = batch.filter(col("op") === "D").select(col("k")).distinct()
        view = ViewDelta.refresh(view, a, ins, del, Seq("k"),
          b, bNoIns, bNoDel, Seq("k"), Seq("k")).localCheckpoint()
        a = a.join(del, Seq("k"), "left_anti").unionByName(ins).localCheckpoint()
        batches += 1
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 2, s"expected one micro-batch per changelog file, got $batches")
    val got = view.orderBy("k", "av").collect().map(_.toSeq).toSeq
    val want = a.join(b, Seq("k")).orderBy("k", "av").collect().map(_.toSeq).toSeq
    assert(got == want, s"maintained view diverged: got=$got want=$want")
    // the deletes really bit: k=1 retracted, k=3 carries the re-inserted value
    val byK = got.map(r => r.head -> r(1)).toMap
    assert(!byK.contains(1) && byK(3) == "a3n" && byK.keySet == Set(2, 3, 5))
  }

  test("flatMapGroupsWithState sessionization: closed sessions match batch") {
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val q = Streaming.sessionizeStream(spark, stream)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sess_out")
      .as[Streaming.Session].collect().map(s => (s.user_id, s.session_idx) -> s).toMap
    val batch = Streaming.sessionizeBatch(spark, Tables.events(spark, dir))
      .collect().map(s => (s.user_id, s.session_idx) -> s).toMap
    // gap-closed sessions emit on data; trailing open sessions emit when the
    // watermark (max event_time - 30min) passes their end+gap deadline
    val wmUs = Tables.events(spark, dir).agg(max(expr("ts div 1000"))).head().getLong(0) -
      Streaming.GapUs
    val lastIdx = batch.keys.groupBy(_._1).map { case (u, ks) => u -> ks.map(_._2).max }
    val expected = batch.filter { case ((u, i), s) =>
      i < lastIdx(u) || (s.end_us + Streaming.GapUs) / 1000 + 1 <= wmUs / 1000 }
    assert(streamed == expected, s"streamed=${streamed.size} expected=${expected.size}")
    assert(streamed.nonEmpty)
  }

  test("streaming crawl-ingest dedup: each micro-batch probes the persisted band store, then lands its own bands") {
    // the realistic 100 TB ingest loop end-to-end: a document stream
    // arrives in micro-batches; every batch is near-dup-checked against
    // the PERSISTED store (corpus text never re-read) and its band keys
    // are appended so LATER batches dedup against it too
    import graft.dedup.IncrementalDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_streamdedup").toString
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "completely different content about spark engines and data pipelines here")
    ).toDF("doc_id", "text")
    IncrementalDedup.buildStore(corpus, "doc_id", "text", path)

    val hits = scala.collection.mutable.Set[(Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint() // probe + append both consume it
        hits ++= IncrementalDedup.probe(spark, path, b, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        IncrementalDedup.appendToStore(spark, path, b, "doc_id", "text")
        ()
      }.start()
    try {
      // batch 1: near-dup of corpus doc 0 + an unrelated doc
      ms.addData(
        (10L, "the quick brown fox jumps over the lazy dog again and again tonight"),
        (11L, "unrelated text on completely new topics nobody wrote about before now"))
      q.processAllAvailable()
      assert(hits.toSet == Set((10L, 0L)), s"batch 1 must hit only the corpus twin, got $hits")
      // batch 2: exact dup of BATCH 1's doc 11 (identical signatures ⇒
      // guaranteed band collision) — only findable because the previous
      // micro-batch's bands are in the store now
      ms.addData((20L, "unrelated text on completely new topics nobody wrote about before now"))
      q.processAllAvailable()
      assert(hits.toSet == Set((10L, 0L), (20L, 11L)),
        s"batch 2 must dedup against batch 1's stored bands, got $hits")
    } finally q.stop()
    // the loop converges with the batch formulation over the same arrivals
    val all = corpus.union(Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (11L, "unrelated text on completely new topics nobody wrote about before now"),
      (20L, "unrelated text on completely new topics nobody wrote about before now")
    ).toDF("doc_id", "text"))
    val batchPairs = graft.dedup.MinHashLsh.candidatePairs(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.toSet.map { p: (Long, Long) => (math.min(p._1, p._2), math.max(p._1, p._2)) }
      .subsetOf(batchPairs), "stream hits must be a subset of the all-at-once candidate set")
  }

  test("kappa backfill: batch history + streaming tail seam exactly into the full batch answer") {
    // the backfill architecture claim: ONE transformation (hourlyAgg)
    // serves both the batch reprocess of history and the live tail, and
    // an hour-aligned cutoff makes the seam exact — no double-counted,
    // no dropped window
    val events = Tables.events(spark, dir).withColumn("ts_us", expr("ts div 1000"))
    val full = Streaming.hourlyAgg(Tables.events(spark, dir), withWatermark = false)
      .as[(Long, String, Long, Double)].collect().toSet
    val hours = full.map(_._1).toSeq.sorted
    val cutoffUs = hours(hours.size / 2) // an exact hour boundary mid-stream
    assert(cutoffUs % 3600000000L == 0)

    val history = Streaming.hourlyAgg(
      Tables.events(spark, dir).filter(expr("ts div 1000") < cutoffUs),
      withWatermark = false).as[(Long, String, Long, Double)].collect().toSet

    val tailDir = java.nio.file.Files.createTempDirectory("events-tail").toString
    events.filter(col("ts_us") >= cutoffUs).drop("ts_us")
      .coalesce(1).write.mode("overwrite").parquet(tailDir)
    val q = Streaming.hourlyAgg(
        spark.readStream.schema(eventsSchema).parquet(tailDir), withWatermark = true)
      .writeStream.outputMode("complete").format("memory").queryName("kappa_tail").start()
    try q.processAllAvailable() finally q.stop()
    val tail = spark.table("kappa_tail")
      .select("hour_start_us", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    assert(history.nonEmpty && tail.nonEmpty)
    assert(history.map(_._1).forall(_ < cutoffUs), "history leaked past the cutoff")
    assert(tail.map(_._1).forall(_ >= cutoffUs), "tail reached before the cutoff")
    assert((history ++ tail) == full, "backfill + tail must seam exactly into the batch answer")
  }

  test("streaming quarantine: per micro-batch, bad rows divert with reasons, clean rows land — union equals input") {
    // the ingest-time shape of Quarantine.split: every micro-batch routes
    // clean rows to the target sink and violating rows (with reasons) to
    // the quarantine sink from ONE pass over the batch
    import graft.operators.Quarantine
    val rules = Seq(
      Quarantine.Rule("value_nonneg", col("value") >= 0),
      Quarantine.Rule("type_known", col("event_type").isin("click", "view", "purchase", "signup")))
    val clean = scala.collection.mutable.ArrayBuffer[Long]()
    val bad = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = spark.readStream.schema(eventsSchema).parquet(streamDir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val (g, d) = Quarantine.split(b, rules)
        clean ++= g.select("event_id").as[Long].collect()
        bad ++= d.select("event_id", "quarantine_reasons").as[(Long, String)].collect()
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val batchAll = Tables.events(spark, dir)
    val n = batchAll.count()
    assert(clean.size + bad.size == n, "split must partition every micro-batch row")
    assert(clean.toSet.intersect(bad.map(_._1).toSet).isEmpty)
    // reasons agree with the batch formulation of the same rules
    val (_, batchBad) = Quarantine.split(batchAll, rules)
    val expected = batchBad.select("event_id", "quarantine_reasons")
      .as[(Long, String)].collect().toSet
    assert(bad.toSet == expected, "streaming quarantine must equal the batch split")
  }

  test("streaming Holt forecaster: the scala step twins the SQL fold; a real stream's closed prefix carries") {
    // (a) twin property: Streaming.holtStep folded over the full hourly
    // series equals the st_holt gate's SQL fold, per event type
    val hourly = Tables.events(spark, dir).withColumn("ts_us", expr("ts div 1000"))
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("hour"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val gate = graft.queries.Modal3.stHolt(spark, dir)
      .select(col("event_type"), col("level"), col("trend"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for ((ty, xs) <- hourly if xs.size >= 2) {
      val scala = Streaming.holtFoldSeries(None, xs).get
      assert(scala == gate(ty), s"$ty: scala twin $scala != SQL fold ${gate(ty)}")
    }
    // (b) carry property on a REAL watermarked stream: fold the closed
    // prefix the stream emitted, then the remainder — must equal (a)
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val q = Streaming.hourlyAgg(stream, withWatermark = true)
      .writeStream.outputMode("append").format("memory").queryName("holt_hours").start()
    try q.processAllAvailable() finally q.stop()
    val closed = spark.table("holt_hours")
      .select(col("event_type"), (col("hour_start_us") / 3600000000L).cast("long").as("hour"),
        col("n"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._2, x._3)).toSeq).toMap
    var carriedTypes = 0
    for ((ty, xs) <- hourly if xs.size >= 2; closedTy <- closed.get(ty)) {
      val allHours = Tables.events(spark, dir).withColumn("ts_us", expr("ts div 1000"))
        .filter(col("event_type") === ty)
        .groupBy(expr("ts_us div 3600000000").as("hour")).agg(count(lit(1)).as("n"))
        .orderBy(col("hour")).as[(Long, Long)].collect().toSeq
      // the stream's closed set must be a PREFIX of the full hour series
      val prefix = closedTy.map(_._2)
      assert(allHours.take(prefix.size).map(_._2) == prefix,
        s"$ty: the watermark-closed hours are not a prefix")
      if (prefix.size >= 2) {
        val mid = Streaming.holtFoldSeries(None, prefix)
        val rest = allHours.drop(prefix.size).map(_._2)
        val resumed = Streaming.holtFoldSeries(mid, rest).get
        assert(resumed == Streaming.holtFoldSeries(None, xs).get,
          s"$ty: prefix-carry fold diverged from the one-shot fold")
        carriedTypes += 1
      }
    }
    assert(carriedTypes > 0, "at least one type must exercise the carry path")
  }

  test("streaming CEP first-match: watermark-closed matches equal the batch matcher") {
    // click -> FIRST purchase within 30min, click-consuming: the stateful
    // stream buffers each user's open suffix, runs the shared matcher on
    // the watermark-closed prefix and carries only the pending-click set
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir)
    val q = Streaming.cepStream(spark, stream)
      .writeStream.outputMode("append").format("memory").queryName("cep_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cep_out")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Streaming.cepBatch(spark, Tables.events(spark, dir))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty, "the watermark must have closed some matches")
    assert(streamed.subsetOf(batch), "every emitted match must agree with the batch matcher")
    // the only legitimate holdback is the open tail (purchases within the
    // 30min watermark delay of max event time) — most matches must close
    assert(streamed.size >= batch.size / 2,
      s"watermark should close most matches (${streamed.size} of ${batch.size})")
  }
}
