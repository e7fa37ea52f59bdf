package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** The auto-sized refine window (rerank < 0): on a corpus where every
  * vector has ~60 near-copies, PQ codes collapse each copy set to one
  * code tuple, so ADC ranks within a set by neighbor_id — a fixed R=40
  * window cannot cover a 60-deep tie set and loses true neighbors,
  * while auto-R (k × max code-group multiplicity) restores brute-force
  * recall. This is the measured 100×-probe failure mode as a spec.
  */
class AutoRerankSpec extends SparkSpec {

  /** 50 base directions × 60 copies with ±0.1% multiplicative noise:
    * exact cosines still order the copies, PQ codes cannot.
    */
  private lazy val corpus: DataFrame = {
    def base(d: org.apache.spark.sql.Column) =
      pmod(xxhash64(concat_ws("-", lit("arr"), col("b"), d)), lit(1000))
        .cast("double") / 1000.0 - 0.5
    def noise(d: org.apache.spark.sql.Column) =
      lit(1.0) +
        (pmod(xxhash64(concat_ws("-", lit("n"), col("b"), col("j"), d)),
          lit(200)).cast("double") - 100.0) / 100000.0
    spark.range(50).select(col("id").as("b"))
      .crossJoin(spark.range(60).toDF("j"))
      .select((col("b") * 1000 + col("j")).as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          d => (base(d) * noise(d)).cast("float")).as("embedding"))
      .localCheckpoint(true)
  }

  private lazy val queries: DataFrame =
    corpus.filter(col("vec_id").isin(0L, 1000L, 2000L))

  private lazy val exact: DataFrame =
    Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id").localCheckpoint(true)

  private def recall(ann: DataFrame): Double = {
    val hit = exact.join(ann.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    hit.toDouble / exact.count()
  }

  test("fixed R=40 loses true neighbors inside a 60-deep code tie set") {
    val r = recall(Similarity.pqTopK(corpus, queries, k = 5, rerank = 40))
    assert(r < 1.0, s"fixed R=40 unexpectedly reached full recall ($r) — " +
      "the planted multiplicity no longer exceeds the window")
  }

  test("auto-R accepts k above the broadcast cap: window covers k, never throws") {
    // k > 1024: the cap keeps queries×R broadcast-bounded but must never
    // undercut k itself — the old min(..., 1024) made the refine branch's
    // `rerank window must cover k` require() throw for any k > 1024
    val got = Similarity.pqTopK(corpus, queries, k = 1500,
      rerank = Similarity.AutoRerank)
    val perQuery = got.groupBy("query_id").count()
      .agg(min("count"), max("count")).head()
    // 3000 corpus vectors minus self → every query ranks up to k of them
    assert(perQuery.getLong(0) == 1500L && perQuery.getLong(1) == 1500L)
  }

  test("auto-R reaches brute-force recall on the same corpus (PQ and IVF-PQ)") {
    val rPq = recall(Similarity.pqTopK(corpus, queries, k = 5,
      rerank = Similarity.AutoRerank))
    assert(rPq == 1.0, s"auto-R PQ recall $rPq != 1.0")
    val rIvf = recall(Similarity.ivfPqTopK(corpus, queries, k = 5,
      coarseK = 8, rerank = Similarity.AutoRerank))
    assert(rIvf == 1.0, s"auto-R IVF-PQ recall $rIvf != 1.0")
  }
}
