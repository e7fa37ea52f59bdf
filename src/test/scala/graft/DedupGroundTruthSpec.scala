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

  test("substringDupSpans pinpoints planted boilerplate; strip removes exactly it") {
    // 10-token boilerplate passage planted in two docs at different
    // offsets, plus one intra-doc repeat; one clean doc as control
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler tail one two"),        // at pos 3..12
      (2L, s"$boiler other words here"),                     // at pos 0..9
      (3L, "completely unrelated text with no duplication anywhere in sight today"),
      (4L, s"xx yy $boiler zz $boiler")                      // twice in ONE doc
    ).toDF("doc_id", "text")

    val spans = Dedup.substringDupSpans(docs, window = 4, minCount = 2)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    // every 4-gram inside the passage is frequent; grams straddling the
    // boundary are unique per doc, so spans cover the passage EXACTLY
    assert(spans == Set((1L, 3L, 12L), (2L, 0L, 9L), (4L, 2L, 11L), (4L, 13L, 22L)),
      s"got $spans")

    val stripped = Dedup.stripSubstringDups(docs, window = 4, minCount = 2)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(stripped(1L) == "alpha beta gamma tail one two")
    assert(stripped(2L) == "other words here")
    assert(stripped(3L) == "completely unrelated text with no duplication anywhere in sight today")
    assert(stripped(4L) == "xx yy zz")

    // span-free docs pass through BYTE-for-byte: irregular whitespace
    // must survive (the token rebuild would silently normalize it)
    val ragged = docs.unionByName(
      Seq((5L, "clean  doc   with ragged   spacing ")).toDF("doc_id", "text"))
    val rs = Dedup.stripSubstringDups(ragged, window = 4, minCount = 2)
      .filter(col("doc_id") === 5L).select("text").as[String].head()
    assert(rs == "clean  doc   with ragged   spacing ")
  }

  test("substringDupSpans is empty on a corpus with no repeated windows") {
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    assert(Dedup.substringDupSpans(docs, window = 4, minCount = 2).count() == 0)
    // and short documents (fewer tokens than the window) don't emit
    // phantom positions through Spark's descending sequence()
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(Dedup.substringDupSpans(short, window = 4, minCount = 2).count() == 0)
  }
}
