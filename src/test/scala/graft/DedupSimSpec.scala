package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Behavioral tests for the dedup / similarity / text operators: planted
  * duplicates must be found; exact formulations must agree.
  */
class DedupSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base =
    "spark shuffles data between stages when a wide dependency requires it " +
      "and the optimizer prunes columns before the scan begins"

  test("minhashNearDups finds planted near-duplicates, not unrelated docs") {
    val docs = Seq(
      (1L, base),
      (2L, base + " today"),                           // near-dup of 1
      (3L, base.replace("spark", "flink")),            // near-dup of 1
      (4L, "completely different text about cooking pasta with garlic and olive oil for dinner guests tonight"),
      (5L, "yet another unrelated document mentioning mountains rivers forests and long hiking trails in autumn"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, k = 2, threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("exact dedup groups identical normalized text") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val groups = Dedup.exact(docs)
      .select("keep_doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(groups == Set((1L, 2L), (3L, 1L)))
  }

  test("simhashNearDups flags hamming<=3 pairs only") {
    val docs = Seq(
      (1L, base), (2L, base + " x"),
      (3L, "an entirely distinct corpus entry regarding medieval architecture and stone bridges"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 8)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("bruteForceTopK returns k nearest with rank 1 = highest cosine") {
    val emb = Tables.embeddings(spark, Sf0001)
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 3)
      .orderBy("rnk").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L))
    val cosines = out.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse)) // descending
  }

  test("hardNegatives returns only cross-label neighbors, nearest first") {
    val emb = Tables.embeddings(spark, Sf0001)
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 0), k = 3)
      .orderBy("rnk").collect()
    assert(out.length == 3)
    out.foreach(r => assert(
      r.getAs[Any]("query_label") != r.getAs[Any]("neighbor_label")))
    val cosines = out.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse))
    // the hardest negative can never beat the overall nearest neighbor
    val best = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 1)
      .collect().head.getAs[Double]("cosine")
    assert(cosines.head <= best + 1e-12)
  }

  test("zero vectors get NULL cosine instead of killing the job (ANSI /0 guard)") {
    val emb = Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(0f, 0f), 1), (2L, Seq(0.5f, 0.5f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 2)
      .collect()
    assert(out.length == 2)
    val byNeighbor = out.map(r => r.getAs[Long]("rnk") -> r.getAs[Long]("neighbor_id")).toMap
    assert(byNeighbor(1L) == 2L) // real vector ranks first; zero vector last
    assert(Similarity.embeddingNearDups(emb).collect() != null) // no throw
  }

  test("LSH ANN recall against brute force is substantial") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall > 0.2, s"LSH recall $recall too low") // 16-bit sigs, 4 bands
  }

  test("language id picks marker-dominant language, 'und' when none") {
    val docs = Seq(
      (1L, "der hund und die katze nicht das haus"),
      (2L, "the cat and the dog not this house"),
      (3L, "xyzzy plugh qwerty"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("token and subword counts") {
    val df = Seq(Tuple1("alpha  beta gamma")).toDF("text")
    val (nt, nsw) = df.select(
      TextAnalysis.tokenCount(col("text")).cast("long"),
      TextAnalysis.subwordCount(col("text"))).as[(Long, Long)].head()
    assert(nt == 3)
    // ceil(5/4)+ceil(4/4)+ceil(5/4) = 2+1+2
    assert(nsw == 5)
  }
}
