package graft

import java.nio.file.Files

/** The fail-loud fixture probe must stay quiet on the real corpus and
  * diagnose drift (missing table / renamed column) in one line.
  */
class FixtureProbeSpec extends SparkSpec {

  test("driver fixture probes clean") {
    assert(Tables.probeFixtures(spark, Sf0001).isEmpty)
  }

  test("a renamed column and a missing table are both diagnosed") {
    val d = Files.createTempDirectory("graft-drift").toString
    // events with `ts` renamed to `event_ts`; every other table absent
    Tables.events(spark, Sf0001)
      .select(
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts_us").as("event_ts"))
      .limit(5).write.parquet(s"$d/events.parquet")
    val drifts = Tables.probeFixtures(spark, d)
    assert(drifts.exists(m => m.contains("events") && m.contains("ts")
      && m.contains("event_ts")))
    assert(drifts.exists(m => m.contains("lineitem") && m.contains("unreadable")))
    assert(drifts.size == Tables.expectedColumns.size) // 9 unreadable + 1 drift
  }
}
