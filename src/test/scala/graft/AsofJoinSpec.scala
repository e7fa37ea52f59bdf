package graft

import graft.events.EventAnalytics

/** Edge semantics of the composed as-of join. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .withColumn("ts_ms", org.apache.spark.sql.functions.expr("ts_us div 1000"))

  test("picks latest right <= left, inclusive at equal timestamps") {
    val ev = mkEvents(
      (1L, 1000000L, 7L, "click"),
      (2L, 2000000L, 7L, "click"),
      (3L, 2000000L, 7L, "purchase"), // same ts as click 2 -> inclusive
      (4L, 3000000L, 7L, "purchase"))
    val out = EventAnalytics.asofJoin(ev, "purchase", "click")
      .select("event_id", "asof_event_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(3L -> Some(2L), 4L -> Some(2L)))
  }

  test("left rows before any right row get null") {
    val ev = mkEvents(
      (1L, 1000000L, 7L, "purchase"),
      (2L, 2000000L, 7L, "click"),
      (3L, 3000000L, 7L, "purchase"))
    val out = EventAnalytics.asofJoin(ev, "purchase", "click")
      .select("event_id", "asof_event_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(1L -> None, 3L -> Some(2L)))
  }

  test("retention cohorts: d=0 row counts every cohort member") {
    import graft.events.EventAnalytics
    val ev = Tables.events(spark, Sf0001)
    val ret = EventAnalytics.retentionCohorts(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ret.nonEmpty)
    // every user is active on their own cohort day, so summing d=0 rows
    // across cohorts equals the number of distinct users
    val d0 = ret.collect { case ((_, 0L), n) => n }.sum
    assert(d0 == ev.select("user_id").distinct().count())
    assert(ret.keys.forall { case (_, d) => d >= 0 && d <= 7 })
  }

  test("value histogram bins partition the events exactly") {
    import graft.events.EventAnalytics
    val ev = Tables.events(spark, Sf0001)
    val h = EventAnalytics.valueHistogram(ev).collect()
    assert(h.map(_.getLong(2)).sum == ev.count())
    assert(h.forall(_.getLong(2) > 0))
  }

  test("users never mix") {
    val ev = mkEvents(
      (1L, 1000000L, 7L, "click"),
      (2L, 2000000L, 8L, "purchase"))
    val out = EventAnalytics.asofJoin(ev, "purchase", "click")
      .select("event_id", "asof_event_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(2L -> None))
  }
}
