package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only interleaved A/B of the PageRank per-iteration join shape
  * (node-scale pre-join vs the historical double edge-scale join) —
  * same JVM, same cached edge table, alternating reps, so machine-load
  * and JIT confounders hit both arms equally. Compare MINIMA per arm.
  */
object PrShapeAb {
  def main(args: Array[String]): Unit = {
    val c = if (args.nonEmpty) args(0).toInt else 100
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = ProbeCorpus.session(32)
    val sfDir = "/root/testdata/sf0.1"
    val li = graft.Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
    val ord = graft.Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val e1 = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000000000L)).as("dst"))
      .distinct()
    val edges: DataFrame = ProbeCorpus.cached(spark, s"/tmp/graft-scale100/edges_${c}x") {
      (0 until c).map { i =>
        e1.select((col("src") + lit(i * 100000000L)).as("src"),
          (col("dst") + lit(i * 100000000L)).as("dst"))
      }.reduce(_ unionByName _)
    }
    println(s"== pr-shape A/B: ${edges.count()} edges, 10 iters, $reps reps/arm")
    def run(shape: String): Double = {
      if (shape == "double") sys.props("graft.pagerank.shape") = "double"
      else sys.props.remove("graft.pagerank.shape")
      val t0 = System.nanoTime()
      graft.analytics.GraphAnalytics.pageRank(edges, iters = 10).count()
      (System.nanoTime() - t0) / 1e9
    }
    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
    // warm BOTH arms: each join shape compiles its own codegen kernels,
    // so a single-arm warm-up would bill the other arm's JIT cost to
    // its first measured rep
    run("pre"); run("double")
    (1 to reps).foreach { _ =>
      Seq("pre", "double").foreach { s =>
        val w = run(s)
        walls(s) = w :: walls.getOrElse(s, Nil)
        println(f"PRAB $s $w%.2f s")
      }
    }
    walls.foreach { case (s, ws) =>
      println(f"PRAB-MIN $s ${ws.min}%.2f s (all: ${ws.reverse.map(w => f"$w%.1f").mkString(", ")})")
    }
    spark.stop()
  }
}
