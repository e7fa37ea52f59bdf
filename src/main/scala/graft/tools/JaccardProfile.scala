package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.functions.VecText

/** Dev-only: stage timing of the blocked n-gram Jaccard pipeline. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
        val spark = ProbeCorpus.session()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, dir)
    (1 to 2).foreach { rep =>
      println(s"== rep $rep")
      val sh = docs.select(col("doc_id"), col("n_chars"), Dedup.shingles(col("text"), 2).as("sh"))
      val hashed = sh.select(col("doc_id"), VecText.hash_set64(col("sh")).as("hs"), size(col("sh")).as("s"))
      time("hashed-sketches")(hashed.write.format("noop").mode("overwrite").save())
      val bucketed = sh.select(col("doc_id"), col("n_chars"),
        explode(array_distinct(array(expr("n_chars div 64"), expr("(n_chars + 32) div 64")))).as("bucket"))
      val a = bucketed.select(col("bucket"), col("doc_id").as("doc_id_a"), col("n_chars").as("ca"))
      val b = bucketed.select(col("bucket"), col("doc_id").as("doc_id_b"), col("n_chars").as("cb"))
      val a1 = expr("ca div 64"); val a2 = expr("(ca + 32) div 64")
      val b1 = expr("cb div 64"); val b2 = expr("(cb + 32) div 64")
      val minShared = least(when(a1 === b1 || a1 === b2, a1), when(a2 === b1 || a2 === b2, a2))
      val cand = a.join(b, Seq("bucket"))
        .filter(col("doc_id_a") < col("doc_id_b") && col("bucket") === minShared)
        .select("doc_id_a", "doc_id_b")
      println(s"  candidates = ${time("candidates-count")(cand.count())}")
      val attached = cand
        .join(broadcast(hashed.select(col("doc_id").as("doc_id_a"), col("hs").as("hs_a"), col("s").as("sa"))), "doc_id_a")
        .join(broadcast(hashed.select(col("doc_id").as("doc_id_b"), col("hs").as("hs_b"), col("s").as("sb"))), "doc_id_b")
      time("attach-sketches")(attached.select(col("doc_id_a"), col("sa"), col("sb"))
        .write.format("noop").mode("overwrite").save())
      val jac = attached.withColumn("jaccard",
        VecText.jaccard_sorted64(col("hs_a"), col("hs_b")).cast("decimal(18,6)"))
        .filter(col("jaccard") >= 0.6)
      time("full-jaccard")(jac.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
