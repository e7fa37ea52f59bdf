package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphAnalytics

/** PageRank beyond the driver's 3-iteration oracle gate: deep iteration
  * must not hit the Catalyst size-only-stats blowup (nested self-
  * referencing plans multiply sizeInBytes estimates until the driver
  * burns minutes in BigInteger math — the round-6 CC failure mode).
  * The intra-loop `Staging.pin` every 2nd iteration is the guard; this
  * spec is the regression test that it stays.
  */
class GraphAnalyticsSpec extends SparkSpec {

  test("iters=10 completes without stats-estimation stalls; mass is conserved") {
    val t0 = System.nanoTime()
    val pr = GraphAnalytics.supplierCustomerPageRank(spark, Sf0001, iters = 10)
    val row = pr.agg(count(lit(1)).as("n"), sum("pr").as("mass"),
      min("pr").as("lo")).head()
    val wall = (System.nanoTime() - t0) / 1e9
    val (n, mass, lo) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(n > 0)
    // floors only ever lose mass: total stays ≤ the initial 1e12 budget,
    // and every node keeps at least the damping base share
    assert(mass <= 1000000000000L, s"mass grew: $mass")
    assert(lo >= (150000000000L / n), s"rank below damping floor: $lo")
    // a stats blowup costs minutes of driver CPU; 10 pinned iterations at
    // sf0.001 run in a few seconds on local[4]
    assert(wall < 90.0, s"iters=10 took ${wall}s — stats blowup regression?")
  }

  test("convergence stop: a regular graph (exact integer fixed point) exits at the first check") {
    import spark.implicits._
    // a cycle is degree-regular, so the uniform vector is an EXACT fixed
    // point of the integer iteration: delta is 0 at the first pin (k=2)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val (prEarly, ran) = GraphAnalytics.pageRankConverged(cycle, iters = 10, convergeEps = 1L)
    assert(ran == 2, s"expected early exit at the first check, ran $ran iterations")
    // early exit must not change values: the full 10-iteration run lands
    // on the same fixed point
    val prFull = GraphAnalytics.pageRank(cycle, iters = 10)
    assert(prEarly.unionByName(prFull).distinct().count() == 4)
    assert(prEarly.agg(min("pr"), max("pr")).head().toSeq.distinct.size == 1,
      "regular graph must stay uniform")
  }

  test("convergence stop: iters stays the hard bound when the graph hasn't converged") {
    import spark.implicits._
    // a star is NOT degree-regular: ranks keep moving, eps=0-strictness
    // (eps=1) won't trigger in 4 iterations — the fallback bound rules
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst")
    val (_, ran) = GraphAnalytics.pageRankConverged(star, iters = 4, convergeEps = 1L)
    assert(ran == 4, s"star graph must run to the bound, ran $ran")
  }

  test("eps=0 (driver default) is the historical fixed-iteration path, bit for bit") {
    val a = GraphAnalytics.supplierCustomerPageRank(spark, Sf0001, iters = 3)
    val b = GraphAnalytics.pageRankConverged(
      graft.Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_suppkey")
        .join(graft.Tables.orders(spark, Sf0001).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000000000L)).as("dst"))
        .distinct(), iters = 3, convergeEps = 0L)
    assert(b._2 == 3)
    assert(a.unionByName(b._1).distinct().count() == a.count())
  }

  test("node id spaces stay disjoint under the 1e12 supplier offset") {
    val pr = GraphAnalytics.supplierCustomerPageRank(spark, Sf0001, iters = 1)
    val suppliers = pr.filter(col("node_id") >= 1000000000000L).count()
    val customers = pr.filter(col("node_id") < 1000000000000L).count()
    assert(suppliers > 0 && customers > 0)
    // the graph is bipartite: customer ids come only from o_custkey,
    // supplier ids only from l_suppkey + 1e12
    val maxCust = pr.filter(col("node_id") < 1000000000000L)
      .agg(max("node_id")).head().getLong(0)
    assert(maxCust < 1000000000000L)
  }
}
