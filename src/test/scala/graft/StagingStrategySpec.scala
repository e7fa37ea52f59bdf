package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity

/** The Staging seam must be value-transparent: every strategy materializes
  * the same rows, so switching the pin for cluster fault tolerance can
  * never change an oracle hash. Runs the two heaviest pin consumers
  * (SemDeDup's shared assignment + Lloyd rounds; CC's pair pin and
  * per-round label pins) under each strategy and compares collected sets.
  */
class StagingStrategySpec extends SparkSpec {
  import spark.implicits._

  private def withStrategy[A](s: String)(body: => A): A = {
    val prev = sys.props.get("graft.staging")
    sys.props("graft.staging") = s
    try body
    finally prev match {
      case Some(v) => sys.props("graft.staging") = v
      case None    => sys.props.remove("graft.staging")
    }
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("semDedup output is identical under local / persist / reliable staging") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val expected = rows(Similarity.semDedup(emb)) // default = local
    for (s <- Seq("persist", "reliable")) {
      assert(withStrategy(s)(rows(Similarity.semDedup(emb))) == expected,
        s"strategy $s diverged")
    }
  }

  test("connectedComponents (both paths) is identical under persist staging") {
    // a chain long enough to take the distributed loop through real rounds
    val docs = (0L to 40L).toDF("doc_id")
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val expected = rows(Dedup.connectedComponents(docs, pairs))
    withStrategy("persist") {
      assert(rows(Dedup.connectedComponents(docs, pairs)) == expected)
      // force the distributed min-label loop under the persist pin too
      assert(rows(Dedup.connectedComponents(docs, pairs, driverEdgeLimit = -1L))
        == expected)
    }
  }

  test("unpin releases local-checkpoint blocks promptly (not GC-deferred)") {
    // Dataset.unpersist alone is a silent no-op for a local checkpoint
    // (its blocks belong to the RDD, not a CacheManager entry) — the
    // iterative operators' eager round-release depends on unpin reaching
    // the leaf RDD itself
    import org.apache.spark.sql.functions.col
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pinned = graft.Staging.pin(
      spark.range(1000).toDF("id").withColumn("v", col("id") * 2))
    assert(pinned.count() == 1000)
    val added = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(added.nonEmpty, "pin must register persisted checkpoint blocks")
    graft.Staging.unpin(pinned)
    val after = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(after.isEmpty,
      s"unpin left checkpoint RDDs ${after} registered — release is GC-deferred")
  }

  test("distributed CC loop releases each superseded round promptly") {
    // the loop unpins via the PINNED frame, not a projection of it — an
    // unpin on `next.drop("changed")` was a silent no-op (Bridge.leafRdd
    // saw a Project, not the LogicalRDD leaf), so every round's
    // checkpoint set survived until GC
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val n = 12L
    val docs = (1L to n).toDF("doc_id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Dedup.connectedComponents(docs, chain, driverEdgeLimit = -1L)
      .as[(Long, Long)].collect().toMap
    assert((1L to n).forall(got(_) == 1L), "chain must collapse to one component")
    val added = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    // only the FINAL round's pin (backing the returned labels) may remain;
    // a leak shows up as one surviving checkpoint set per round (≥ 3 for
    // a 12-node chain)
    assert(added.size <= 1,
      s"CC loop left ${added.size} checkpoint sets registered — round release is GC-deferred")
  }

  test("unknown strategy fails fast") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label").limit(4)
    withStrategy("replicate") {
      intercept[IllegalArgumentException](Similarity.semDedup(emb).collect())
    }
  }
}
