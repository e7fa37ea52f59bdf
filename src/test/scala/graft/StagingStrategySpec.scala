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

  test("unknown strategy fails fast") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label").limit(4)
    withStrategy("replicate") {
      intercept[IllegalArgumentException](Similarity.semDedup(emb).collect())
    }
  }
}
