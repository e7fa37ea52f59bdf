package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.events.EventAnalytics
import graft.streaming.EventStream

/** Event-time-correct streaming bursts: after the watermark passes every
  * real event, the finalized bursts must equal the batch
  * [[EventAnalytics.globalBursts]] — including the sequential
  * `burst_id` ordinals — for in-order, reversed, and redelivered
  * arrival waves. A burst is retrospective (a late event can bridge two
  * intervals believed separate), so an emit-on-sight implementation
  * cannot pass the reversed-wave case.
  */
class BurstStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 600000L // 10 min, the events_interval_join feeder gap

  private lazy val batchEvents = Tables.events(spark, Sf0001)

  private lazy val want: Set[(Long, Long, Long, Long)] =
    EventAnalytics.globalBursts(batchEvents, "error", Gap)
      .select("burst_id", "lo", "hi", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

  /** Far-future SAME-type sentinel: only admissible-type rows pass the
    * pushed-down filter and advance event time. It opens a span whose
    * finalization horizon sits beyond the watermark it creates, so it
    * is never emitted.
    */
  private def heartbeat(dir: java.nio.file.Path, name: String): Unit = {
    val hiUs = batchEvents.agg(max(col("ts_us"))).head.getLong(0) +
      60L * 24 * 3600 * 1000000L
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(999999999L, hiUs * 1000L, 0L, "error", 0.0, "{}"))),
      EventStream.eventsSchema)
    df.coalesce(1).write.parquet(dir.resolve(name).toString)
    Files.list(dir.resolve(name))
      .filter(_.toString.endsWith(".parquet"))
      .forEach(f => Files.move(f, dir.resolve(name + "-" + f.getFileName)))
  }

  private def run(tag: String, waves: Seq[org.apache.spark.sql.DataFrame])
      : Seq[(Long, Long, Long, Long)] = {
    val root = Files.createTempDirectory(s"graft-burst-$tag")
    val landing = Files.createDirectory(root.resolve("landing"))
    waves.zipWithIndex.foreach { case (w, i) =>
      w.select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
          col("user_id"), col("event_type"), col("value"),
          col("props")).coalesce(1)
        .write.parquet(landing.resolve(s"w$i").toString)
      Files.list(landing.resolve(s"w$i"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(f => Files.move(f, landing.resolve(s"w$i-" + f.getFileName)))
      Thread.sleep(1200) // strictly later mtime per wave (file order)
    }
    heartbeat(landing, "hb")
    val stream = EventStream.fromParquetDir(
      spark, landing.toString, maxFilesPerTrigger = 1)
    val out = EventStream.burstStream(stream, "error", Gap,
      watermark = "720 hours").toDF()
    val q = out.writeStream.format("memory").queryName(s"burst_$tag")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    spark.table(s"burst_$tag")
      .select("burst_id", "lo", "hi", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
  }

  test("streamed bursts equal batch for in-order waves (incl. ordinals)") {
    val cut = 1705000000000000L
    val got = run("fwd", Seq(
      batchEvents.filter(col("ts_us") < cut),
      batchEvents.filter(col("ts_us") >= cut)))
    assert(got.size == got.toSet.size, "duplicate emissions")
    assert(got.toSet == want)
    assert(got.nonEmpty)
  }

  test("reversed waves: late events bridge/extend open bursts, ids still sequential") {
    val cut = 1705000000000000L
    val got = run("rev", Seq(
      batchEvents.filter(col("ts_us") >= cut),
      batchEvents.filter(col("ts_us") < cut)))
    assert(got.toSet == want)
  }

  test("redelivered wave is absorbed: no duplicate or double-counted bursts") {
    val cut = 1705000000000000L
    val w0 = batchEvents.filter(col("ts_us") < cut)
    val got = run("redeliver", Seq(
      w0, batchEvents.filter(col("ts_us") >= cut), w0))
    assert(got.size == got.toSet.size, "duplicate emissions")
    assert(got.toSet == want)
  }
}
