package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.streaming.EventStream

/** Pins Tables.events / EventStream against fixture schema drift: the
  * driver has regenerated `/root/testdata` with different physical `ts`
  * encodings across rounds (parquet TIMESTAMP(NANOS) surfaced as long via
  * nanosAsLong, then parquet timestamp[us] scanned as TIMESTAMP_NTZ).
  * Round 10 lost 19 driver queries to exactly this drift; this spec
  * writes the SAME logical rows in BOTH encodings and asserts the loader
  * yields identical derived time columns from each.
  */
class EventsEncodingSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, epoch-micros, user_id, type, value, props)
  private val rows = Seq(
    (1L, 1718000000000001L, 7L, "click", 1.5, "{}"),
    (2L, 1718000000999999L, 7L, "purchase", 2.0, "{}"),
    (3L, 1718086400123456L, 8L, "click", 0.25, "{\"k\":1}"))

  /** Write the rows with `ts` as a raw long of NANOS (the shape the legacy
    * fixture scans to under nanosAsLong).
    */
  private def writeLegacyNanos(dir: String): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, us, u, t, v, p) =>
        Row(id, us * 1000L, u, t, v, p)
      }),
      EventStream.eventsSchema)
    df.coalesce(1).write.parquet(s"$dir/events.parquet")
  }

  /** Write the rows with `ts` as TIMESTAMP_NTZ (parquet timestamp[us],
    * isAdjustedToUTC=false — the current driver-fixture encoding).
    */
  private def writeMicrosNtz(dir: String): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, us, u, t, v, p) =>
        Row(id,
          java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, ((us % 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC),
          u, t, v, p)
      }),
      EventStream.eventsSchemaMicros)
    df.coalesce(1).write.parquet(s"$dir/events.parquet")
  }

  private def load(dir: String): Set[(Long, Long, Long, Long, Long, Long)] =
    Tables.events(spark, dir)
      .select($"event_id", $"ts_ns", $"ts_us", $"ts_ms",
        unix_micros($"ts_utc").as("utc_us"), $"user_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  test("both ts encodings load to identical derived time columns") {
    val legacy = Files.createTempDirectory("graft-enc-ns").toString
    val micros = Files.createTempDirectory("graft-enc-us").toString
    writeLegacyNanos(legacy)
    writeMicrosNtz(micros)
    val a = load(legacy)
    val b = load(micros)
    assert(a == b, s"encodings diverged:\nlegacy=$a\nmicros=$b")
    // and the values are the expected micros, not shifted by a timezone
    val expected = rows.map { case (id, us, u, _, _, _) =>
      (id, us * 1000L, us, us / 1000L, us, u)
    }.toSet
    assert(a == expected)
  }

  test("the driver fixture itself loads with all derived columns non-null") {
    val ev = Tables.events(spark, Sf0001)
    val n = ev.count()
    assert(n > 0)
    assert(ev.filter(
      $"ts_us".isNull || $"ts_ms".isNull || $"ts_ns".isNull || $"ts_utc".isNull
    ).count() == 0)
    // ts_us and ts_utc agree exactly (µs precision contract)
    assert(ev.filter(unix_micros($"ts_utc") =!= $"ts_us").count() == 0)
  }

  test("streaming source normalizes both encodings identically to batch") {
    val legacy = Files.createTempDirectory("graft-enc-stream-ns").toString
    writeLegacyNanos(legacy)
    // stream reads the directory containing the parquet part files
    val legacyStream = EventStream.fromParquetDir(spark, s"$legacy/events.parquet")
    EventStream.runToMemory(
      legacyStream.select($"event_id", $"ts_us", $"ts_ms"),
      "enc_legacy_out", org.apache.spark.sql.streaming.OutputMode.Append())
    val micros = Files.createTempDirectory("graft-enc-stream-us").toString
    writeMicrosNtz(micros)
    val microsStream = EventStream.fromParquetDir(spark, s"$micros/events.parquet")
    EventStream.runToMemory(
      microsStream.select($"event_id", $"ts_us", $"ts_ms"),
      "enc_micros_out", org.apache.spark.sql.streaming.OutputMode.Append())
    val a = spark.table("enc_legacy_out").as[(Long, Long, Long)].collect().toSet
    val b = spark.table("enc_micros_out").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a == rows.map { case (id, us, _, _, _, _) => (id, us, us / 1000L) }.toSet)
  }

  test("streaming source on an empty-at-start dir falls back to the µs schema") {
    val d = Files.createTempDirectory("graft-enc-empty").toString
    // no files yet: the footer peek fails → eventsSchemaMicros fallback
    val stream = EventStream.fromParquetDir(spark, d)
    // files arrive only AFTER the stream was declared (the fixture
    // helper writes under <dir>/events.parquet; copy the parts in)
    val late = Files.createTempDirectory("graft-enc-late").toString
    writeMicrosNtz(late)
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$late/events.parquet"))
      .filter(_.toString.endsWith(".parquet"))
      .forEach(f => java.nio.file.Files.copy(f,
        java.nio.file.Paths.get(d).resolve(f.getFileName)))
    EventStream.runToMemory(stream.select($"event_id", $"ts_us"),
      "enc_empty_out", org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("enc_empty_out").as[(Long, Long)].collect().toSet
    assert(got == rows.map { case (id, us, _, _, _, _) => (id, us) }.toSet)
  }

  test("empty-at-start fallback fails LOUDLY if legacy nanos files land later") {
    val d = Files.createTempDirectory("graft-enc-drift").toString
    // no files yet → pinned µs fallback schema; the batch path would have
    // dispatched on the scanned type, but a stream cannot re-dispatch
    val stream = EventStream.fromParquetDir(spark, d)
    val late = Files.createTempDirectory("graft-enc-drift-late").toString
    writeLegacyNanos(late) // WRONG encoding under the pinned schema
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$late/events.parquet"))
      .filter(_.toString.endsWith(".parquet"))
      .forEach(f => java.nio.file.Files.copy(f,
        java.nio.file.Paths.get(d).resolve(f.getFileName)))
    val e = intercept[Throwable] {
      EventStream.runToMemory(stream.select($"event_id", $"ts_us"),
        "enc_drift_out", org.apache.spark.sql.streaming.OutputMode.Append())
    }
    // either the parquet conversion refuses the physical type or the
    // fallback's sanity gate raises FIXTURE DRIFT — silent misread rows
    // are the one forbidden outcome
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("FIXTURE DRIFT") || chain.toLowerCase.contains("parquet")
      || chain.toLowerCase.contains("convert"), s"unexpected failure shape: $chain")
    assert(!spark.catalog.tableExists("enc_drift_out")
      || spark.table("enc_drift_out").isEmpty, "corrupt rows leaked downstream")
  }

  private def unix_micros(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.unix_micros(c)
}
