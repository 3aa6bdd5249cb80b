package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** The message-bus source seam (SURVEY §2G boundary, VERDICT r11 missing
  * #1): a DataSourceV2 micro-batch "topic" with Kafka-shaped offset
  * semantics proves the streaming operators are source-agnostic — the
  * same watermark/state machinery that runs on file/memory streams runs
  * unchanged on an offset-planned bus, with rate limiting
  * (maxOffsetsPerTrigger), mid-topic starts (startingOffset), and
  * exactly-once range planning across many micro-batches. */
class StreamBusSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("the short name registers through the DataSourceRegister SPI and batch-reads the topic") {
    val df = spark.read.format("graftbus").option("rows", 100).load()
    assert(df.count() == 100)
    assert(df.columns.toSeq ==
      Seq("event_id", "user_id", "event_type", "ts", "value"))
    // value nulls every 11th record — null handling crosses the seam
    assert(df.filter("value IS NULL").count() == 10)
  }

  test("maxOffsetsPerTrigger drains a backlog across many micro-batches, exactly once") {
    val q = spark.readStream.format("graftbus")
      .option("rows", 500).option("maxOffsetsPerTrigger", 64).load()
      .writeStream.outputMode("append").format("memory").queryName("bus_drain")
      .start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("bus_drain").select("event_id").as[Long].collect()
    assert(ids.length == 500, s"exactly-once: got ${ids.length} of 500 records")
    assert(ids.toSet == (0L until 500L).toSet,
      "offset-range planning must lose and duplicate nothing")
    // 500 records at <=64/trigger needs >= 8 distinct micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 8,
      s"rate limit must split the backlog; batches: " +
        q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("startingOffset begins mid-topic, skipping exactly the earlier records") {
    val q = spark.readStream.format("graftbus")
      .option("rows", 200).option("startingOffset", 150).load()
      .writeStream.outputMode("append").format("memory").queryName("bus_mid")
      .start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("bus_mid").select("event_id").as[Long].collect().toSet
    assert(ids == (150L until 200L).toSet)
  }

  test("checkpoint restart resumes from the committed offset — a fresh stream instance picks up mid-topic") {
    // a NEW query (new BusMicroBatchStream, admission cursor reset to 0)
    // started on the SAME checkpoint must resume from the recovered
    // offset, not re-drain from the start — the deserializeOffset cursor
    // bump; without it the first post-restart triggers plan empty ranges.
    val ckpt = java.nio.file.Files.createTempDirectory("bus-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("bus-out").toString
    // file sink: supports checkpoint recovery AND is exactly-once through
    // its own _spark_metadata commit log — so the final read asserts the
    // strongest form (every offset exactly once across BOTH runs)
    def start() = spark.readStream.format("graftbus")
      .option("rows", 300).option("maxOffsetsPerTrigger", 60).load()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.recentProgress.length < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally q1.stop()
    val mid = spark.read.parquet(out).count()
    assert(mid > 0 && mid < 300, s"first run must stop mid-topic (visible: $mid)")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect()
    assert(ids.length == 300 && ids.toSet == (0L until 300L).toSet,
      s"restart must deliver every offset exactly once (got ${ids.length} rows, " +
        s"${ids.toSet.size} distinct)")
  }

  test("the watermarked hourly operator runs UNCHANGED on the bus source and matches its batch twin") {
    // the same hourlyAgg every file/memory-stream spec drives — zero
    // operator changes across sources is the entire point of the seam
    val stream = spark.readStream.format("graftbus")
      .option("rows", 2000).option("maxOffsetsPerTrigger", 700).load()
    val q = Streaming.hourlyAgg(stream, withWatermark = true)
      .writeStream.outputMode("append").format("memory").queryName("bus_hourly")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bus_hourly")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Streaming.hourlyAgg(
      spark.read.format("graftbus").option("rows", 2000).load(),
      withWatermark = false)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "watermark must have closed windows")
    assert(streamed.subsetOf(batch),
      "every window emitted over the bus must match the batch twin")
    // records arrive in offset order == event-time order here, so only
    // the (hour, type) windows inside the 2h watermark of the topic
    // frontier stay open: <= 3 hour buckets x 5 types
    assert(streamed.size >= batch.size - 15,
      s"watermark closed ${streamed.size} of ${batch.size} windows — too few")
  }

  test("Trigger.AvailableNow drains the backlog under admission control, SELF-terminates, survives a restart mid-drain exactly-once") {
    // the backfill-then-stop production pattern: the source declares
    // SupportsTriggerAvailableNow, so the engine pins the drain target at
    // query start, micro-batches advance under the same
    // maxOffsetsPerTrigger admission control, and the query terminates by
    // ITSELF when the target is reached — no processAllAvailable, no stop.
    // A kill mid-drain plus a fresh AvailableNow run on the same
    // checkpoint must complete the backlog with the file sink exactly-once.
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("bus-an-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("bus-an-out").toString
    def start() = spark.readStream.format("graftbus")
      .option("rows", 2000).option("maxOffsetsPerTrigger", 50).load()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.recentProgress.length < 2 && q1.isActive && System.nanoTime() < deadline)
        Thread.sleep(20)
    } finally q1.stop() // kill mid-drain (2000 rows / 50 per trigger = 40 batches)
    val mid = spark.read.parquet(out).count()
    assert(mid > 0 && mid < 2000, s"first run must die mid-drain (visible: $mid)")
    val q2 = start()
    // the AvailableNow contract: the restarted query finishes the backlog
    // and terminates on its own within the timeout
    assert(q2.awaitTermination(120000),
      "AvailableNow must self-terminate once the prepared target is reached")
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect()
    assert(ids.length == 2000 && ids.toSet == (0L until 2000L).toSet,
      s"exactly-once across the restart (got ${ids.length} rows, ${ids.toSet.size} distinct)")
    // admission control held through the drain: 2000 rows at <=50/trigger
    // needs many batches even after the restart
    assert(q2.recentProgress.count(_.numInputRows > 0) >= 5,
      s"rate limit must hold under AvailableNow; batches: " +
        q2.recentProgress.map(_.numInputRows).mkString(","))
  }
}
