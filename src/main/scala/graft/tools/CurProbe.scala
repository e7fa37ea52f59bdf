package graft.tools

import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.dedup.Dedup
import graft.pipeline.Curation
import graft.sample.Sampling

/** Dev-only: phase timing for the curation pipeline. */
object CurProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
        val spark = ProbeCorpus.session()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CURPROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 4).foreach { rep =>
      val docs = Tables.documents(spark, dir)
      val bench = col("doc_id") % 37 === 0
      val gated = Curation.gates(docs, bench)
      t(s"rep$rep gates")(gated.write.format("noop").mode("overwrite").save())
      val flagged = Dedup.decontaminateCorpus(
        docs.select("doc_id", "text"), docs.filter(bench), 40L)
      t(s"rep$rep decon")(flagged.write.format("noop").mode("overwrite").save())
      t(s"rep$rep full")(
        SparkEntry.queries("text_curation_pipeline")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
