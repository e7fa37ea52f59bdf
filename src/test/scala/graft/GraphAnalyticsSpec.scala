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
