package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sample.Sampling
import graft.streaming.StreamingSampling

/** The streamed per-stratum reservoir must equal the batch
  * stratifiedTopN over the union of everything that arrived — including
  * under redelivery (the deterministic min-rank reservoir is a pure
  * function of the key set, so replay cannot change it).
  */
class StreamingSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed reservoir converges to batch stratifiedTopN; replay-safe") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "source")
    val n = 5

    val dir = Files.createTempDirectory("graft-reservoir")
    docs.filter(col("doc_id") % 2 === 0).write.parquet(dir.resolve("even").toString)
    docs.filter(col("doc_id") % 2 === 1).write.parquet(dir.resolve("odd").toString)
    val in = Files.createDirectory(dir.resolve("in"))
    def copyParts(sub: String, prefix: String): Unit = {
      val s = Files.list(dir.resolve(sub))
      try s.filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.copy(f, in.resolve(prefix + f.getFileName.toString))
      } finally s.close()
    }
    copyParts("even", "a-")
    copyParts("odd", "b-")
    copyParts("even", "c-replay-") // at-least-once redelivery

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in.toString)
    val q = StreamingSampling
      .reservoirPerStratum(stream, col("source"), col("doc_id"), n)
      .toDF()
      .writeStream.format("memory").queryName("reservoir")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()

    // latest snapshot per stratum = rows at that stratum's max ver
    val snapRows = spark.table("reservoir")
      .as[(String, Long, Long, String)].collect()
    val maxVer = snapRows.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).max }
    val latest = snapRows.filter(r => r._2 == maxVer(r._1))
      .map(r => (r._1, r._3, r._4)).toSet

    val want = Sampling
      .stratifiedTopN(docs, col("source"), col("doc_id"), n)
      .select(col("source"), col("rn"), col("doc_id").cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(latest == want)
    assert(latest.nonEmpty)
    // bounded state: no snapshot ever emitted more than n members
    val overfull = snapRows.groupBy(r => (r._1, r._2)).values.count(_.size > n)
    assert(overfull == 0)
  }
}
