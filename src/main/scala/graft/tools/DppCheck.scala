package graft.tools

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Dev-only: does dynamic partition pruning fire on the list-partitioned
  * ANN store serve path? Prints the formatted plan.
  */
object DppCheck {
  def main(args: Array[String]): Unit = {
    val spark = ProbeCorpus.session(8)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").drop("label")
    val queries = emb.filter(col("vec_id") < 8)
    val cents = Similarity.trainQuantizer(emb, 8)
    val lists = Similarity.assignToCentroids(emb.select("vec_id", "embedding"), cents)
    val pdir = "/tmp/graft-dppcheck-lists"
    lists.write.mode("overwrite").partitionBy("centroid_id").parquet(pdir)
    val plists = spark.read.parquet(pdir)
      .select(col("vec_id"), col("embedding"), col("centroid_id").cast("long"))
    val served = Similarity.ivfServe(plists, cents, queries, k = 10)
    served.explain("formatted")
  }
}
