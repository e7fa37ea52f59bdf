package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.events.EventAnalytics
import graft.streaming.EventStream

/** Stream/batch parity: each streaming operator must produce the same
  * final answer as its batch twin over the same (replayed) input.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-events")
    Files.copy(
      Paths.get(s"$Sf0001/events.parquet"),
      d.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  private lazy val batchEvents = Tables.events(spark, Sf0001)

  test("telemetry listener observes per-batch progress of streaming queries") {
    val listener = graft.sink.Telemetry.attach(spark)
    try {
      val stream = EventStream.fromParquetDir(spark, streamDir)
      EventStream.runToMemory(
        EventStream.tumblingDaily(stream), "telemetry_probe", OutputMode.Complete())
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.progress.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val p = listener.progress.filter(_.queryName == "telemetry_probe")
      assert(p.nonEmpty, "no progress events observed")
      assert(p.map(_.numInputRows).sum == batchEvents.count())
    } finally graft.sink.Telemetry.detach(spark, listener)
  }

  test("streaming tumbling daily counts equal the batch aggregation") {
    val stream = EventStream.fromParquetDir(spark, streamDir)
    EventStream.runToMemory(
      EventStream.tumblingDaily(stream), "tumbling_out", OutputMode.Complete())
    // sum_value included: stream and batch twins must agree on the full
    // output contract (same decimal-exact sum, same final double cast)
    val got = spark.table("tumbling_out")
      .select("day", "event_type", "n", "sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    val want = EventAnalytics.tumblingDaily(batchEvents)
      .select("day", "event_type", "n", "sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join equals the batch range join") {
    val stream = EventStream.fromParquetDir(spark, streamDir)
    EventStream.runToMemory(
      EventStream.rangeJoinAfter(stream, "purchase", 60),
      "range_join_out", OutputMode.Append())
    val cols = Seq("user_id", "anchor_event_id", "other_event_id", "other_type", "dt_us")
    val got = spark.table("range_join_out").select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    val want = EventAnalytics.rangeJoinAfter(batchEvents, "purchase", 60)
      .select(cols.head, cols.tail: _*)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming session windows equal the batch sessionization") {
    val stream = EventStream.fromParquetDir(spark, streamDir)
    EventStream.runToMemory(
      EventStream.sessions(stream), "sessions_out", OutputMode.Complete())
    val got = spark.table("sessions_out")
      .select("user_id", "n_events", "session_start_ms", "session_end_ms")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = EventAnalytics.sessionize(batchEvents)
      .select(col("user_id"), col("n_events"),
        col("session_start_ms"), col("session_end_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("events later than the watermark are dropped, fresh events keep flowing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val d = Files.createTempDirectory("graft-late")
    def write(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, day, hour) =>
          Row(id, java.time.Instant.parse(s"${day}T0$hour:00:00Z").toEpochMilli * 1000000L,
            7L, "click", 1.0, "{}")
        }),
        EventStream.eventsSchema)
      df.write.parquet(d.resolve(name).toString)
      Files.list(d.resolve(name)).filter(_.toString.endsWith(".parquet"))
        .forEach(f => Files.move(f, d.resolve(name + "-" + f.getFileName)))
    }
    write("b1", Seq((1L, "2024-06-10", 2L), (2L, "2024-06-10", 3L)))
    val stream = EventStream.fromParquetDir(spark, d.toString, maxFilesPerTrigger = 100)
    val q = EventStream.tumblingDaily(stream, watermark = "1 hour").writeStream
      .format("memory").queryName("late_out").outputMode("update").start()
    q.processAllAvailable()
    // second batch: one event far older than the watermark + one fresh
    write("b2", Seq((3L, "2024-01-01", 2L), (4L, "2024-06-10", 4L)))
    q.processAllAvailable()
    q.stop()
    val days = spark.table("late_out").select("day")
      .collect().map(_.getString(0)).toSet
    assert(days == Set("2024-06-10"), s"late 2024-01-01 must be dropped, got $days")
    // the fresh event of batch 2 did arrive: the day's count reached 3
    val maxN = spark.table("late_out").agg(max_by(col("n"), col("n")))
      .head().getLong(0)
    assert(maxN == 3)
  }

  test("streaming dedup drops replayed duplicate files") {
    val d = Files.createTempDirectory("graft-dup")
    Files.copy(Paths.get(s"$Sf0001/events.parquet"), d.resolve("p0.parquet"))
    Files.copy(Paths.get(s"$Sf0001/events.parquet"), d.resolve("p1.parquet")) // full replay
    val stream = EventStream.fromParquetDir(spark, d.toString)
    EventStream.runToMemory(
      EventStream.dedupEvents(stream).select("event_id"),
      "dedup_out", OutputMode.Append())
    val n = spark.table("dedup_out").count()
    val distinct = batchEvents.select("event_id").distinct().count()
    assert(n == distinct) // each event_id exactly once despite the doubled input
  }

  test("streaming funnel detection equals the batch funnel membership") {
    val stream = EventStream.fromParquetDir(spark, streamDir)
    EventStream.runToMemory(
      EventStream.funnelDetect(stream, "signup", "purchase").toDF(),
      "funnel_out", OutputMode.Append())
    val got = spark.table("funnel_out").as[Long].collect().toSet
    val want = EventAnalytics.funnel(batchEvents, "signup", "purchase")
      .as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("funnel membership survives cross-batch event-time disorder (to lands before from)") {
    // membership is max(to) > min(from) — monotone — so a purchase
    // delivered one micro-batch BEFORE its event-time-earlier signup
    // must still qualify the user once the signup lands
    val root = Files.createTempDirectory("graft-funnel-disorder")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val ckpt = root.resolve("ckpt").toString
    val hits = scala.collection.mutable.Set[Long]()
    def runWave(): Unit = {
      val src = spark.readStream
        .schema("user_id LONG, event_type STRING, ts_us LONG")
        .option("recursiveFileLookup", "true").parquet(landing)
      val q = EventStream.funnelDetect(src, "signup", "purchase").toDF()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          hits ++= b.as[Long].collect(); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // wave 1: the to-event only — no emission possible yet
    Seq((7L, "purchase", 20L)).toDF("user_id", "event_type", "ts_us")
      .write.parquet(s"$landing/w0")
    runWave()
    assert(hits.isEmpty, "to-event alone must not qualify")
    // wave 2: the out-of-order from-event (earlier ts) arrives late
    Seq((7L, "signup", 10L), (8L, "signup", 30L))
      .toDF("user_id", "event_type", "ts_us")
      .write.parquet(s"$landing/w1")
    runWave()
    assert(hits.toSet == Set(7L),
      s"expected user 7 (from=10 < to=20) and not user 8 (no to), got $hits")
  }

  test("streaming sessions merge events exactly gap apart, like the batch rule") {
    // batch starts a new session only when diff > gap (STRICT): two
    // events exactly 30 min apart share a session, 30 min + 1 µs apart
    // split. session_window merges TOUCHING ranges (merge ⟺ diff ≤ gap),
    // so the two rules coincide at both boundary sides — pinned here
    val t0 = 1700000000000000L // µs
    val gapUs = 30L * 60 * 1000 * 1000
    val rows = Seq(
      (1L, 100L, "click", t0), (1L, 101L, "click", t0 + gapUs), // exact gap: merge
      (2L, 200L, "click", t0), (2L, 201L, "click", t0 + gapUs + 1)) // gap+1µs: split
    val ev = rows.toDF("user_id", "event_id", "event_type", "ts_us")
      .withColumn("ts_ms", (col("ts_us") / 1000).cast("long"))
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
    val want = EventAnalytics.sessionize(ev)
      .select(col("user_id"), col("n_events"),
        col("session_start_ms"), col("session_end_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.count(_._1 == 1L) == 1 && want.count(_._2 == 2L) == 1,
      s"batch premise: user 1 one 2-event session, got $want")
    val dir = Files.createTempDirectory("graft-gap-edge").toString
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    EventStream.runToMemory(
      EventStream.sessions(stream), "sessions_gap_edge", OutputMode.Complete())
    val got = spark.table("sessions_gap_edge")
      .select("user_id", "n_events", "session_start_ms", "session_end_ms")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("stateful query runs on the RocksDB state store (production config)") {
    // HDFS-backed state keeps every key on-heap; RocksDB is the provider
    // that survives 100TB-scale key cardinalities. Same query, same
    // results, different store.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = EventStream.fromParquetDir(s2, streamDir)
    val q = EventStream.tumblingDaily(stream).writeStream
      .format("memory").queryName("rocksdb_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()
    q.processAllAvailable(); q.stop()
    val got = s2.table("rocksdb_out")
      .select("day", "event_type", "n").as[(String, String, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong)).collect().toSet
    val want = EventAnalytics.tumblingDaily(batchEvents)
      .select("day", "event_type", "n").as[(String, String, Long)].collect().toSet
    assert(got == want)
  }

  test("within-watermark dedup also drops replayed duplicates (bounded state)") {
    val d = Files.createTempDirectory("graft-dup-wm")
    Files.copy(Paths.get(s"$Sf0001/events.parquet"), d.resolve("p0.parquet"))
    Files.copy(Paths.get(s"$Sf0001/events.parquet"), d.resolve("p1.parquet"))
    val stream = EventStream.fromParquetDir(spark, d.toString, maxFilesPerTrigger = 100)
    EventStream.runToMemory(
      EventStream.dedupEventsBounded(stream).select("event_id"),
      "dedup_wm_out", OutputMode.Append())
    // duplicates arrive in the same batch window -> still deduped exactly
    assert(spark.table("dedup_wm_out").count() ==
      batchEvents.select("event_id").distinct().count())
  }

  test("transformWithState running counts converge to batch per-user counts") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    val stream = EventStream.fromParquetDir(s2, streamDir)
    val q = EventStream.runningCounts(stream).toDF()
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    // final (max) running count per user equals the batch count
    val got = s2.table("tws_out").groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n").as("n"))
      .as[(Long, Long)].collect().toMap
    val want = batchEvents.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("streaming stateful LWW equals the batch latest-per-user") {
    val stream = EventStream.fromParquetDir(spark, streamDir)
    EventStream.runToMemory(
      EventStream.latestPerUser(stream).toDF(), "lww_out", OutputMode.Update())
    // update-mode sink appends one row per key per batch; last state wins
    val got = spark.table("lww_out")
      .groupBy("user_id")
      .agg(max_by(struct(col("last_event_id"), col("last_event_type"), col("last_ts_ms")),
        struct(col("ts_us"), col("last_event_id"))).as("s"))
      .select(col("user_id"), col("s.last_event_id"), col("s.last_event_type"),
        col("s.last_ts_ms"))
      .as[(Long, Long, String, Long)].collect().toSet
    val want = EventAnalytics.latestPerUser(batchEvents)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("gap fill densifies the hourly series: contiguous grid, zero counts, LOCF values") {
    val filled = EventAnalytics.gapFillHourly(batchEvents)
      .select("event_type", "hour", "n", "value_locf")
      .as[(String, String, Long, Double)].collect()
    val byType = filled.groupBy(_._1)
    byType.foreach { case (_, rows) =>
      val hours = rows.map(_._2).sorted
      // dense: row count == span between first and last hour, inclusive
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH")
      def t(s: String) = java.time.LocalDateTime.parse(s, fmt)
      val span = java.time.Duration.between(t(hours.head), t(hours.last)).toHours + 1
      assert(rows.length == span, s"grid not dense: ${rows.length} rows over $span hours")
      assert(hours.distinct.length == hours.length)
      // LOCF: a zero-count hour carries the previous hour's value forward
      val ordered = rows.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(prev, cur) if cur._3 == 0L =>
          assert(cur._4 == prev._4, s"LOCF broken at ${cur._2}")
        case _ =>
      }
    }
    // the operator must actually have filled something at this sf
    assert(filled.exists(_._3 == 0L), "no gaps filled — test data too dense to exercise LOCF")
    // first grid hour per type is an observed hour: value_locf never null/NaN
    assert(filled.forall(r => !r._4.isNaN))
  }
}
