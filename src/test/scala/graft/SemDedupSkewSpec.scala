package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** SemDeDup's skew guard: clusters above `blockRows` take the triangle
  * sub-block pair join. The sub-blocking must be invisible in the output
  * (same survivors for any blockRows) while bounding how many rows any
  * one pair task sees.
  */
class SemDedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private def survivors(df: org.apache.spark.sql.DataFrame, blockRows: Int) =
    Similarity.semDedup(df, blockRows = blockRows)
      .as[(Long, Long)].collect().toSet

  test("survivors are blockRows-invariant (hot path == single-block path)") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    // 500 vectors over 8 clusters: blockRows=16 forces EVERY cluster
    // through the triangle path (m = 4..8); 65536 keeps them all on the
    // single-key path. 48 lands clusters on m=2 — the cross-block edge.
    val expected = survivors(emb, 65536)
    assert(survivors(emb, 16) == expected)
    assert(survivors(emb, 48) == expected)
  }

  test("a planted 10x-oversized duplicate cluster prunes to its earliest id under sub-blocking") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val n = emb.count()
    // mass-duplicated boilerplate: 10x the mean cluster size of copies of
    // vector 0, all collapsing into one centroid — the pathological case
    // from the design doc. New ids sit above the real corpus.
    val copies = emb.filter(col("vec_id") === 0)
      .crossJoin(spark.range(1, 625).toDF("i"))
      .select((col("i") + 100000L).as("vec_id"), col("embedding"))
    val withHot = emb.unionByName(copies)
    val got = survivors(withHot, blockRows = 64) // copies split over ~10 blocks
    // every copy is dominated by vector 0 (cosine exactly 1), wherever
    // its salt landed it — cross-block domination must see it
    assert(!got.exists(_._1 > 100000L), "all planted copies must be pruned")
    assert(got.exists(_._1 == 0L), "the earliest copy survives")
    // the hot corpus prunes identically whether or not sub-blocking splits
    // the oversized cluster (training is data-dependent, so the clean
    // corpus is not a valid baseline — blockRows-invariance is)
    assert(survivors(withHot, 1 << 20) == got)
  }

  test("salt disperses a hot cluster into near-even sub-blocks") {
    // the formula semDedup salts with: pmod(xxhash64(vec_id), m). For a
    // 640-row cluster at m=10 every block must stay within 2x of even —
    // the bound that makes per-task pair work ~blockRows², not cluster².
    val m = 10
    val blockSizes = spark.range(0, 640).toDF("vec_id")
      .select(pmod(xxhash64(col("vec_id")), lit(m)).as("blk"))
      .groupBy("blk").count().as[(Long, Long)].collect().toMap
    assert(blockSizes.size == m, "all blocks populated")
    assert(blockSizes.values.max <= 2 * 640 / m,
      s"worst block ${blockSizes.values.max} rows — salt not dispersing")
  }
}
