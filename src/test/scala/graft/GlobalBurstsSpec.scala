package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.events.EventAnalytics

/** The shard-merge [[EventAnalytics.globalBursts]] must equal the direct
  * global-window replay — including the sequential `burst_id` ordinals
  * the driver oracle hashes — for ANY shard width, on data crafted to
  * exercise every cross-shard case: a burst spanning a shard boundary, a
  * chain threading 3+ shards through single-interval middles, empty
  * shards inside and between bursts, and gap == gapMs exactly (merges;
  * only strictly-greater splits).
  */
class GlobalBurstsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("ts_ms", "event_id", "event_type")

  private def got(df: DataFrame, gap: Long, shard: Long): Set[(Long, Long, Long, Long)] =
    EventAnalytics.globalBursts(df, "error", gap, shard)
      .select("burst_id", "lo", "hi", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def want(df: DataFrame, gap: Long): Set[(Long, Long, Long, Long)] =
    EventAnalytics.globalBurstsDirect(df, "error", gap)
      .select("burst_id", "lo", "hi", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("crafted cross-shard chains equal the direct replay at many shard widths") {
    // gap = 10. Shard width will sweep; events at absolute ms positions.
    // burst A: 0,5,8        burst B: 40,45      burst C: 100,105,110,115
    // chain D: 200,210,220,230,240 (consecutive gaps exactly == gap → one burst)
    // lone E: 500           F: 610,615 (empty space before)
    val rows = Seq(0L, 5L, 8L, 40L, 45L, 100L, 105L, 110L, 115L,
      200L, 210L, 220L, 230L, 240L, 500L, 610L, 615L)
      .zipWithIndex.map { case (ts, i) => (ts, i.toLong, "error") } ++
      // decoy type interleaved everywhere — must not affect bursts
      Seq((3L, 900L, "click"), (42L, 901L, "click"), (205L, 902L, "click"))
    val df = ev(rows)
    val w = want(df, 10L)
    assert(w.size == 6, s"direct replay shape: $w")
    // widths chosen to slice burst D at every internal boundary, to make
    // single-event shards, and to cover width < gap and width ≫ data
    Seq(1L, 3L, 7L, 10L, 11L, 25L, 64L, 100L, 128L, 1000L, 100000L).foreach { sw =>
      assert(got(df, 10L, sw) == w, s"shard width $sw diverged")
    }
  }

  test("ties on ts_ms and a burst that IS the whole shard") {
    val rows = Seq((100L, 2L, "error"), (100L, 1L, "error"), (100L, 3L, "error"),
      (250L, 4L, "error"), (260L, 5L, "error"))
    val df = ev(rows)
    Seq(5L, 50L, 150L, 400L).foreach { sw =>
      assert(got(df, 10L, sw) == want(df, 10L), s"shard width $sw diverged")
    }
  }

  test("fixture events equal the direct replay (default + tiny shards)") {
    val events = Tables.events(spark, Sf0001)
    val w = want(events, 600000L)
    assert(w.nonEmpty)
    assert(got(events, 600000L, 0L) == w, "default shard width diverged")
    // tiny shards → many cross-shard links on real data
    assert(got(events, 600000L, 700000L) == w, "700s shards diverged")
  }

  test("shard-merge plan has no unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val events = Tables.events(spark, Sf0001)
    // the WindowExec "No Partition Defined" WARN (the one in the r11
    // bench tail) fires exactly when a window's partition spec is empty;
    // the optimized logical plan is where a constant partition key would
    // get folded away if any rule did so — assert it survives
    val wins = EventAnalytics.globalBursts(events, "error", 600000L)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected Window nodes in plan")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned Window survived:\n${wins.map(_.partitionSpec)}")
    // and the direct replay really is the shape being avoided
    val direct = EventAnalytics.globalBurstsDirect(events, "error", 600000L)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(direct.exists(_.partitionSpec.isEmpty))
  }
}
