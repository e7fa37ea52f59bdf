package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VecText

/** Ground-truth audit of the hash-based (rows-only-checked) dedup path:
  * on the sf0.001 corpus, compare MinHash-LSH output against the
  * EXHAUSTIVE all-pairs exact Jaccard — no blocking, no LSH, every one
  * of the C(500,2) pairs verified.
  */
class DedupGroundTruthSpec extends SparkSpec {
  import spark.implicits._

  test("MinHash-LSH finds exactly the true J>=0.7 pair set of the corpus") {
    val docs = Tables.documents(spark, Sf0001)
    val sh = docs.select(col("doc_id"),
      VecText.hash_set64(Dedup.shingles(col("text"), 2)).as("hs"))
    val a = sh.select(col("doc_id").as("a"), col("hs").as("hs_a"))
    val b = sh.select(col("doc_id").as("b"), col("hs").as("hs_b"))
    val truth = a.crossJoin(broadcast(b))
      .filter(col("a") < col("b"))
      .withColumn("j", VecText.jaccard_sorted64(col("hs_a"), col("hs_b")))
      .filter(col("j") >= 0.7)
      .select(col("a"), col("b"), col("j"))
      .as[(Long, Long, Double)].collect()
    val truthPairs = truth.map(t => (t._1, t._2)).toSet

    val lsh = Dedup.minhashNearDups(docs, k = 2, threshold = 0.7)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet

    // soundness: every LSH pair is a true pair (the exact verify stage
    // guarantees this — no false positives possible)
    assert(lsh.subsetOf(truthPairs))
    // recall: near-exact duplicates (J>=0.9) collide in some band with
    // probability ~1 - (1-0.9^4)^16 > 0.9999998 — they must all be found
    val strongPairs = truth.filter(_._3 >= 0.9).map(t => (t._1, t._2)).toSet
    assert(strongPairs.subsetOf(lsh),
      s"missing strong pairs: ${strongPairs.diff(lsh)}")
    assert(truthPairs.nonEmpty && lsh.nonEmpty)
    info(s"truth=${truthPairs.size} lsh=${lsh.size} strong=${strongPairs.size}")
  }
}
