package graft

import org.apache.spark.sql.functions._

import graft.events.EventAnalytics

/** The grid-bucketed interval-overlap join must emit exactly the pair
  * set of the naive predicate join — every overlapping pair exactly
  * once, for ANY grid size (the emit-once rule keeps the copy in the
  * cell of max(a_lo, b_lo); a wrong rule shows up as duplicates or
  * boundary losses at some grid).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def intervals(seed: String, n: Int, idCol: String, lo: String,
      hi: String) =
    spark.range(n).select(
      col("id").as(idCol),
      pmod(xxhash64(concat_ws("-", lit(seed), col("id"))), lit(10000L)).as(lo))
      .withColumn(hi,
        col(lo) + pmod(xxhash64(concat_ws("x", lit(seed), col(idCol))), lit(500L)))

  test("grid join equals the naive predicate join at every grid size") {
    val a = intervals("ia", 200, "a_id", "a_lo", "a_hi").localCheckpoint(true)
    val b = intervals("ib", 300, "b_id", "b_lo", "b_hi").localCheckpoint(true)
    val want = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")))
          .as("overlap_ms"))
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    Seq(7L, 100L, 499L, 5000L).foreach { grid =>
      val got = EventAnalytics.intervalOverlapJoin(a, b, grid)
        .as[(Long, Long, Long)].collect()
      assert(got.length == got.toSet.size, s"grid $grid emitted duplicates")
      assert(got.toSet == want, s"grid $grid pair set diverged")
    }
  }

  test("zero-length and touching intervals count as overlapping") {
    val a = Seq((1L, 100L, 100L)).toDF("a_id", "a_lo", "a_hi") // a point
    val b = Seq((1L, 100L, 200L), (2L, 0L, 100L), (3L, 101L, 200L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = EventAnalytics.intervalOverlapJoin(a, b, 50L)
      .select("b_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), "closed-interval semantics: touch counts, disjoint does not")
  }
}
