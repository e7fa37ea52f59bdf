package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.functions.VecText

/** Dev-only: stage-by-stage timing of the minhash near-dup pipeline. */
object DedupProfile {
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
      val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      time("shingles")(sh.write.format("noop").mode("overwrite").save())
      val withSig = sh.withColumn("sig", VecText.minhash_sig(col("sh"), 64))
      time("shingles+sig")(withSig.write.format("noop").mode("overwrite").save())
      val buckets = Dedup.lshBuckets(withSig.select(col("doc_id"), col("sig")), 16, 4)
      time("buckets")(buckets.write.format("noop").mode("overwrite").save())
      val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_id_a"))
      val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_id_b"))
      val cand = a.join(b, Seq("band", "bucket"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select("doc_id_a", "doc_id_b").distinct()
      val n = time("candidates")(cand.count())
      println(s"  n_candidates = $n")
      time("full")(Dedup.minhashNearDups(docs).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
