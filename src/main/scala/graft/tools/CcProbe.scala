package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Dev-only: phase timing for the connected-components pipeline. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = ProbeCorpus.session()
    val docs = Tables.documents(spark, dir)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CCPROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      val pairs = t(s"rep$rep pairs")(
        Dedup.blockedJaccardPairs(docs).localCheckpoint(true))
      println(s"CCPROBE rep$rep n_pairs ${pairs.count()}")
      val labels = t(s"rep$rep components")(
        Dedup.connectedComponents(docs.select("doc_id"), pairs))
      t(s"rep$rep materialize")(labels.write.format("noop").mode("overwrite").save())
      println(s"CCPROBE rep$rep n_clusters " +
        labels.filter(col("doc_id") =!= col("cluster_id")).count())
    }
    spark.stop()
  }
}
