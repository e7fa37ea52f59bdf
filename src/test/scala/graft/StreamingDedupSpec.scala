package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, StreamingDedup}

/** Streamed-equals-batch for incremental MinHash-LSH near-dup: the
  * maintained pair table after any arrival sequence must equal
  * [[Dedup.minhashNearDups]] over the union — pairs across waves
  * included (the case a per-batch-only run would miss).
  */
class StreamingDedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)

  private lazy val batchWant: Set[(Long, Long, Double)] =
    Dedup.minhashNearDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def runWaves(tag: String, waves: Seq[DataFrame]): Set[(Long, Long, Double)] = {
    val root = Files.createTempDirectory(s"graft-sdedup-$tag")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val state = root.resolve("state").toString
    val pairsDir = root.resolve("pairs").toString
    val ckpt = root.resolve("ckpt").toString
    waves.zipWithIndex.foreach { case (w, i) =>
      w.write.parquet(s"$landing/w$i")
      val stream = spark.readStream.schema(docs.schema)
        .option("recursiveFileLookup", "true").parquet(landing)
      StreamingDedup.start(stream, state, pairsDir, ckpt, numBuckets = 8)
        .awaitTermination()
    }
    StreamingDedup.pairs(spark, pairsDir).collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"),
        r.getAs[Double]("jaccard"))).toSet
  }

  test("incremental pair table equals the batch operator over the union") {
    assert(batchWant.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    val got = runWaves("fwd", Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1)))
    assert(got == batchWant)
  }

  test("arrival order does not change the pair table") {
    val got = runWaves("rev", Seq(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0)))
    assert(got == batchWant)
  }

  test("redelivered and overlapping waves collapse idempotently") {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val got = runWaves("redeliver", Seq(even, docs, even))
    assert(got == batchWant)
  }

  test("clustersView and survivors equal the batch pipeline over cross-wave waves") {
    val root = Files.createTempDirectory("graft-sdedup-clusters")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val state = root.resolve("state").toString
    val pairsDir = root.resolve("pairs").toString
    val ckpt = root.resolve("ckpt").toString
    // reversed waves: cross-wave pairs exist (spec above), so cluster
    // merges span triggers — exactly what labels-on-read must absorb
    Seq(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0)).zipWithIndex.foreach { case (w, i) =>
      w.write.parquet(s"$landing/w$i")
      val stream = spark.readStream.schema(docs.schema)
        .option("recursiveFileLookup", "true").parquet(landing)
      StreamingDedup.start(stream, state, pairsDir, ckpt, numBuckets = 8)
        .awaitTermination()
    }
    val streamed = StreamingDedup.clustersView(spark, pairsDir, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Dedup.connectedComponents(
      docs.select("doc_id"), Dedup.minhashNearDups(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
    // survivors are exactly the min-id cluster representatives
    val surv = StreamingDedup.survivors(spark, pairsDir, docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == batch.values.toSet)
    assert(surv.size < docs.count()) // the fixture has real near-dups
  }

  test("state holds band-signature rows only, partitioned for pruning") {
    val root = Files.createTempDirectory("graft-sdedup-state")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val state = root.resolve("state").toString
    val pairsDir = root.resolve("pairs").toString
    docs.write.parquet(s"$landing/w0")
    val stream = spark.readStream.schema(docs.schema)
      .option("recursiveFileLookup", "true").parquet(landing)
    StreamingDedup.start(stream, state, pairsDir,
      root.resolve("ckpt").toString, numBuckets = 8).awaitTermination()
    val st = spark.read.parquet(state)
    // 16 band rows per doc, no text column, layout key present
    assert(st.count() == docs.count() * 16)
    assert(!st.columns.contains("text"))
    assert(st.columns.contains("__bkt"))
    assert(Files.list(java.nio.file.Paths.get(state)).filter(
      _.getFileName.toString.startsWith("__bkt=")).count() > 0)
  }
}
