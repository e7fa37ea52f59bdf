package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sink.KeyedUpsertSink

/** Dev-only probe for the optimistic sink's disjoint-writer parallelism
  * claim: two writers feeding DISJOINT bucket sets of ONE table should
  * approach 2× the serialized throughput, because the optimistic
  * protocol serializes them only at the final put-if-absent (the lock
  * path serializes the WHOLE read-merge-stage-commit per table).
  *
  * Method: split a key universe by the sink's own bucket hash into a
  * low-bucket and a high-bucket half (provably disjoint touched sets),
  * then run W batches per writer through (a) the lock-path atomic sink
  * and (b) the optimistic sink, two threads each, on fresh tables.
  * Reports wall seconds and the speedup ratio; also sanity-checks both
  * tables converge to the identical LWW row set. One rep per
  * configuration — the quantity of interest is the serialize-vs-overlap
  * gap (expected ≥ 1.5×), not ±10% on one wall.
  */
object SinkConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val batchesPerWriter = if (args.nonEmpty) args(0).toInt else 4
    val rowsPerBatch = if (args.length > 1) args(1).toInt else 30000
    val numBuckets = 32
    val spark = ProbeCorpus.session(32)
    import spark.implicits._

    // key universe, split by the sink's layout hash into disjoint halves
    val keys = spark.range(0, rowsPerBatch.toLong * 4)
      .select(concat(lit("k"), col("id")).as("k"))
      .withColumn("b", KeyedUpsertSink.bucketOf(Seq("k"), numBuckets))
    keys.persist(); keys.count()
    val low = keys.filter(col("b") < numBuckets / 2).drop("b")
    val high = keys.filter(col("b") >= numBuckets / 2).drop("b")

    def batchOf(half: DataFrame, batch: Int): DataFrame = half
      .withColumn("v", lit(batch.toLong))
      .withColumn("ts", lit(batch.toLong * 10))
      // rotate a distinct subset per batch so merges touch real old rows
      .filter(xxhash64(col("k"), lit(batch)) % 3 === 0)

    def drive(label: String,
        sink: (DataFrame, Long) => Unit, sink2: (DataFrame, Long) => Unit): Double = {
      val t0 = System.nanoTime()
      val tA = new Thread(() =>
        (0 until batchesPerWriter).foreach(i => sink(batchOf(low, i), i.toLong)))
      val tB = new Thread(() =>
        (0 until batchesPerWriter).foreach(i => sink2(batchOf(high, i), 100L + i)))
      tA.start(); tB.start(); tA.join(); tB.join()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sink-conc] $label%-10s $sec%7.2f s")
      sec
    }

    def freshTable(tag: String): String =
      Files.createTempDirectory(tag).resolve("t").toString

    val keysCols = Seq("k")
    val order = Seq(col("ts"), col("v"))

    // warm both code paths once (JIT + parquet committer classes)
    val warm = freshTable("graft-conc-warm")
    KeyedUpsertSink.upsertBucketedAtomic(spark, warm, keysCols, order, numBuckets)(
      batchOf(low, 0).limit(1000), 0L)
    KeyedUpsertSink.upsertBucketedOptimistic(spark, warm + "o", keysCols, order, numBuckets)(
      batchOf(low, 0).limit(1000), 0L)

    val lockPath = freshTable("graft-conc-lock")
    val lockSink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, lockPath, keysCols, order, numBuckets) _
    val lockSec = drive("locked", lockSink, lockSink)

    val optPath = freshTable("graft-conc-opt")
    def optSink(b: DataFrame, id: Long): Unit = {
      KeyedUpsertSink.upsertBucketedOptimistic(
        spark, optPath, keysCols, order, numBuckets)(b, id)
      ()
    }
    val optSec = drive("optimistic", optSink, optSink)

    // both protocols must land on the identical LWW table
    val a = KeyedUpsertSink.readBucketedAtomic(spark, lockPath)
      .select("k", "v", "ts").as[(String, Long, Long)].collect().toSet
    val o = KeyedUpsertSink.readBucketedAtomic(spark, optPath)
      .select("k", "v", "ts").as[(String, Long, Long)].collect().toSet
    require(a == o, s"protocol divergence: ${(a diff o).take(5)} / ${(o diff a).take(5)}")
    println(f"[sink-conc] rows=${a.size} speedup=${lockSec / optSec}%.2f×" +
      f" (locked ${lockSec}%.2f s / optimistic ${optSec}%.2f s)")
    spark.stop()
  }
}
