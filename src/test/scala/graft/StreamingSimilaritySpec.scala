package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sim.{Similarity, StreamingSimilarity}

/** Streaming top-k over a growing corpus must converge to the exact
  * batch brute-force answer once the whole corpus has streamed in —
  * including across multiple micro-batches (state merge path).
  */
class StreamingSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("incremental streaming top-k converges to the batch answer across batches") {
    val emb = Tables.embeddings(spark, Sf0001)
    val total = emb.count()
    // two files -> at least two micro-batches with maxFilesPerTrigger=1
    val dir = Files.createTempDirectory("graft-simstream")
    emb.filter(col("vec_id") % 2 === 0).write
      .parquet(dir.resolve("even").toString)
    emb.filter(col("vec_id") % 2 === 1).write
      .parquet(dir.resolve("odd").toString)
    val in = Files.createDirectory(dir.resolve("in"))
    def moveParts(sub: String, prefix: String): Unit = {
      val d = dir.resolve(sub)
      Files.list(d).filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.move(f, in.resolve(prefix + f.getFileName.toString))
      }
    }
    moveParts("even", "a-")
    moveParts("odd", "b-")

    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val queries = emb.filter(col("vec_id") < 8)
    val q = StreamingSimilarity.topKStream(stream, queries, k = 5)
      .toDF()
      .writeStream.format("memory").queryName("simstream_out")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()

    // latest snapshot per query = rows at max seen (computed driver-side:
    // the memory-sink view can't self-join)
    val rows = spark.table("simstream_out")
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("seen"))
      .as[(Long, Long, Long, Long)].collect()
    val latestSeen = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val got = rows.filter(r => r._4 == latestSeen(r._1))
      .map(r => (r._1, r._2, r._3)).toSet
    assert(latestSeen.values.max == total - 1) // whole corpus seen (minus self)

    val want = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }
}
