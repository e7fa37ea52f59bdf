package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Alternating large-star/small-star connected components: three-way
  * label equality with the driver union-find and the pointer-jumping
  * distributed loop, on crafted topologies and the fixture pair graph.
  */
class StarContractionSpec extends SparkSpec {
  import spark.implicits._

  private def endpointLabels(pairs: DataFrame): Map[Long, Long] = {
    // the established paths label every doc in `docs`; restrict to
    // endpoints for comparison with the star contraction's contract
    val nodes = pairs.select(col("doc_id_a").as("doc_id"))
      .union(pairs.select(col("doc_id_b").as("doc_id"))).distinct()
    Dedup.connectedComponents(nodes, pairs)
      .as[(Long, Long)].collect().toMap
  }

  private def starLabels(pairs: DataFrame): Map[Long, Long] =
    Dedup.starContractionComponents(pairs).as[(Long, Long)].collect().toMap

  test("single edge, chain, and already-star topologies") {
    val cases = Seq(
      Seq((1L, 2L)),
      (1L until 12L).map(i => (i, i + 1)),            // long chain
      (2L to 9L).map(i => (1L, i)),                   // star at the min
      (1L to 8L).map(i => (9L, i)),                   // star at the MAX
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L))     // cycle + separate edge
    )
    cases.foreach { edges =>
      val pairs = edges.toDF("doc_id_a", "doc_id_b")
      assert(starLabels(pairs) == endpointLabels(pairs), s"edges=$edges")
    }
  }

  test("duplicate and reversed input edges do not change the labeling") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L))
      .toDF("doc_id_a", "doc_id_b")
    assert(starLabels(pairs) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields an empty labeling") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_id_a", "doc_id_b")
    assert(starLabels(pairs).isEmpty)
  }

  test("seeded random graph: equality with union-find and the pointer-jumping loop") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("doc_id_a", "doc_id_b")
    val star = starLabels(pairs)
    assert(star == endpointLabels(pairs))
    // and against the distributed pointer-jumping path explicitly
    val nodes = pairs.select(col("doc_id_a").as("doc_id"))
      .union(pairs.select(col("doc_id_b").as("doc_id"))).distinct()
    val dist = Dedup.connectedComponents(nodes, pairs, driverEdgeLimit = -1L)
      .as[(Long, Long)].collect().toMap
    assert(star == dist)
  }

  test("fixture pair graph: equality on real near-dup pairs") {
    val emb = Tables.embeddings(spark, Sf0001)
    val pairs = graft.sim.Similarity.embeddingNearDupsLsh(emb)
      .select(col("vec_id_a").as("doc_id_a"), col("vec_id_b").as("doc_id_b"))
    assert(starLabels(pairs) == endpointLabels(pairs))
  }

  test("hub-skewed graph converges in few rounds (maxIter guard far from binding)") {
    // two hubs bridged by a chain — the shape pointer-jumping pays
    // per-round hub fan-out on; star contraction must still label it
    val hubA = (2L to 200L).map(i => (1L, i))
    val hubB = (302L to 500L).map(i => (301L, i))
    val bridge = Seq((200L, 250L), (250L, 302L))
    val pairs = (hubA ++ hubB ++ bridge).toDF("doc_id_a", "doc_id_b")
    val labels = starLabels(pairs)
    assert(labels.values.toSet == Set(1L))
    assert(labels.size == 401)
  }
}
