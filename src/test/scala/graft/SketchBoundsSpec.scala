package graft

import org.apache.spark.sql.functions._

import graft.analytics.Queries

/** Value-sanity bounds for the two rows-only sketch queries: the driver
  * contract can only check their row shape (sketch internals are
  * engine-specific, so there is no DuckDB hash to match), which means a
  * silently wildly-wrong estimate would stay green forever. These pins
  * assert each sketch's documented error bound against the EXACT value
  * of the same quantity, and that the bound itself has teeth (a
  * deliberately corrupted estimate fails it).
  */
class SketchBoundsSpec extends SparkSpec {
  import spark.implicits._

  /** HLL++ bound: |estimate − exact| ≤ k·rsd·exact. Spark's default
    * relativeSD is 0.05; estimates on fixed input are deterministic, and
    * observed error is well under 2σ — 3σ keeps the pin robust to
    * implementation-version drift without admitting a broken sketch.
    */
  private def withinHll(estimate: Long, exact: Long, rsd: Double = 0.05,
      sigmas: Double = 3.0): Boolean =
    math.abs(estimate - exact) <= sigmas * rsd * exact

  /** KLL-style rank bound for percentile_approx(accuracy): the returned
    * value must be an element whose rank is within n/accuracy (plus one
    * rank of slack for boundary rounding) of the requested quantile.
    */
  private def withinRank(value: Double, sorted: Array[Double], q: Double,
      accuracy: Int): Boolean = {
    val n = sorted.length
    val slack = math.max(n.toDouble / accuracy, 1.0).ceil.toInt
    val target = (q * (n - 1)).round.toInt
    val lo = sorted(math.max(0, target - slack))
    val hi = sorted(math.min(n - 1, target + slack))
    lo <= value && value <= hi
  }

  test("q_approx_distinct: HLL estimate within 3 sigma of the exact distinct count") {
    val approx = Queries.approxDistinctParts(spark, Sf0001)
      .select("l_returnflag", "approx_parts")
      .as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, Sf0001)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, ex) =>
      assert(withinHll(approx(flag), ex),
        s"$flag: HLL estimate ${approx(flag)} outside 3σ·rsd of exact $ex")
    }
    // the bound has teeth: a sketch mis-configured to half/double the
    // cardinality (e.g. a wrong-rsd or truncated-register estimate) fails
    exact.foreach { case (flag, ex) =>
      assert(!withinHll(ex * 2, ex), s"$flag: 2× corruption passed the bound")
      assert(!withinHll(ex / 2, ex), s"$flag: ½× corruption passed the bound")
    }
  }

  test("q_approx_quantiles: each percentile lies within the accuracy's rank window") {
    val accuracy = 10000 // must match Queries.approxQuantiles
    val approx = Queries.approxQuantiles(spark, Sf0001)
      .select("l_returnflag", "p25", "p50", "p75")
      .as[(String, Double, Double, Double)].collect()
    val values = Tables.lineitem(spark, Sf0001)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.nonEmpty)
    approx.foreach { case (flag, p25, p50, p75) =>
      val sorted = values(flag)
      assert(withinRank(p25, sorted, 0.25, accuracy), s"$flag p25=$p25 out of rank window")
      assert(withinRank(p50, sorted, 0.50, accuracy), s"$flag p50=$p50 out of rank window")
      assert(withinRank(p75, sorted, 0.75, accuracy), s"$flag p75=$p75 out of rank window")
      // teeth: a quantile answered from the wrong rank must fail its window
      assert(!withinRank(p75, sorted, 0.25, accuracy),
        s"$flag: p75 passed the p25 window — bound is vacuous on this data")
    }
  }
}
