package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.events.EventAnalytics
import graft.streaming.EventStream

/** Event-time-correct streaming as-of join: after the watermark passes
  * every real event, the emitted matches must equal the batch as-of
  * join — including out-of-order arrival waves where a left's true
  * anchor arrives one batch LATER than the left itself (the case a
  * match-on-sight implementation gets wrong).
  */
class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val batchEvents = Tables.events(spark, Sf0001)

  private lazy val want: Set[(Long, Option[Long], Option[Long])] =
    EventAnalytics.asofJoin(batchEvents, "purchase", "click")
      .select("event_id", "asof_event_id", "asof_ts_ms")
      .as[(Long, Option[Long], Option[Long])].collect().toSet

  /** A single far-future RIGHT-side sentinel (user 0, "click") that
    * drives the watermark past every real event: the type filter pushes
    * into the parquet scan, so only admissible-type rows advance event
    * time — and a right-side row is inert in state (rights emit
    * nothing), so the output is unpolluted.
    */
  private def heartbeat(dir: java.nio.file.Path, name: String): Unit = {
    // max real ts + 60 days: far enough that even the 720 h watermark
    // delay (sized to the cross-wave disorder) passes every real event.
    // Derived from the fixture, not hardcoded: a regenerated fixture
    // with a later time range would silently leave the watermark short
    // of real events and shrink the emitted match set
    val hiUs = batchEvents.agg(max(col("ts_us"))).head.getLong(0) +
      60L * 24 * 3600 * 1000000L
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(999999999L, hiUs * 1000L, 0L, "click", 0.0, "{}"))),
      EventStream.eventsSchema)
    df.coalesce(1).write.parquet(dir.resolve(name).toString)
    Files.list(dir.resolve(name))
      .filter(_.toString.endsWith(".parquet"))
      .forEach(f => Files.move(f, dir.resolve(name + "-" + f.getFileName)))
  }

  private def run(tag: String, waves: Seq[org.apache.spark.sql.DataFrame])
      : Set[(Long, Option[Long], Option[Long])] = {
    val root = Files.createTempDirectory(s"graft-asof-$tag")
    val landing = Files.createDirectory(root.resolve("landing"))
    val ckpt = root.resolve("ckpt").toString
    waves.zipWithIndex.foreach { case (w, i) =>
      // raw legacy-encoding rows so fromParquetDir's normalization runs
      w.select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
          col("user_id"), col("event_type"), col("value"),
          col("props")).coalesce(1)
        .write.parquet(landing.resolve(s"w$i").toString)
      // the file stream source matches top-level files only: flatten …
      Files.list(landing.resolve(s"w$i"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(f => Files.move(f, landing.resolve(s"w$i-" + f.getFileName)))
      // … and orders by modification time: each wave (and the
      // heartbeat, crucially, LAST) must carry a strictly later stamp,
      // or the watermark can jump ahead of unprocessed real events
      Thread.sleep(1200)
    }
    heartbeat(landing, "hb")
    val stream = EventStream.fromParquetDir(
      spark, landing.toString, maxFilesPerTrigger = 1)
    // watermark delay must exceed the cross-wave disorder (waves span
    // the full ~26-day fixture): 720 h tolerates a whole wave arriving
    // "late" relative to another
    val out = EventStream.asofJoinStream(stream, "purchase", "click",
      watermark = "720 hours").toDF()
    val q = out.writeStream.format("memory").queryName(s"asof_$tag")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table(s"asof_$tag")
      .select("event_id", "asof_event_id", "asof_ts_ms")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(rows.size == rows.toSet.size, "duplicate emissions")
    rows.toSet
  }

  test("streamed as-of equals batch when waves arrive in time order") {
    val cut = 1705000000000000L
    val got = run("fwd", Seq(
      batchEvents.filter(col("ts_us") < cut),
      batchEvents.filter(col("ts_us") >= cut)))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streamed as-of equals batch when anchors arrive AFTER their lefts") {
    // clicks delivered a wave later than purchases: match-on-sight would
    // miss every anchor in the overlap window
    val got = run("ooo", Seq(
      batchEvents.filter(col("event_type") === "purchase"),
      batchEvents.filter(col("event_type") =!= "purchase")))
    assert(got == want)
  }

  test("redelivered wave does not duplicate or change matches") {
    val cut = 1705000000000000L
    val w0 = batchEvents.filter(col("ts_us") < cut)
    val got = run("redeliver", Seq(
      w0, batchEvents.filter(col("ts_us") >= cut), w0))
    // redelivered rows are watermark-late by then and inadmissible; the
    // match set is unchanged. (Append-mode rows already emitted cannot
    // be retracted, so dedup of redelivered OUTPUT is the sink's LWW
    // job — state-side the replay must be a no-op, which this asserts.)
    assert(got == want)
  }
}
