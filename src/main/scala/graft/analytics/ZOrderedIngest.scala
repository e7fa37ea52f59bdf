package graft.analytics

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest into a Z-ORDER clustered table — the lakehouse
  * `OPTIMIZE ZORDER BY` maintenance loop in plain Spark files:
  *
  *   - each micro-batch APPENDS to an unclustered `delta-<batchId>/`
  *     region — a cheap parquet write, no global sort on the ingest
  *     path (ingest latency never pays the clustering);
  *   - when the pending delta regions reach `compactEvery`, the whole
  *     table (current clustered generation ∪ pending deltas) re-clusters
  *     through [[Layout.writeZOrdered]] into a fresh `zgen-<n>/`
  *     directory, and a manifest file swaps atomically (write-temp +
  *     POSIX rename — the generation-pointer discipline of
  *     `KeyedUpsertSink.upsertBucketedAtomic`). A crash before the swap
  *     leaves the old manifest: readers keep the previous consistent
  *     view and the half-written generation is garbage, not corruption;
  *   - readers ([[read]]) see clustered-generation ∪ pending-deltas: the
  *     big clustered part prunes on BOTH filter dimensions via footer
  *     min/max (the whole point of the Z layout), while the unpruned
  *     tail is bounded by the compaction cadence.
  *
  * Idempotence: a replayed batch overwrites its own `delta-<batchId>`
  * directory (same rows), and compaction is a deterministic function of
  * (generation, pending deltas), so at-least-once redelivery converges.
  *
  * Scale shape: compaction rewrites the full table — at 100 TB that
  * becomes INCREMENTAL re-clustering (only the Z-ranges the deltas
  * overlap, exactly like Delta/Iceberg's partial OPTIMIZE); the
  * manifest/generation discipline here is the part that carries over
  * unchanged, and `compactEvery` is the knob trading unpruned-tail size
  * against rewrite amortization.
  */
object ZOrderedIngest {

  private def manifestPath(dir: String): Path = Paths.get(dir, "_MANIFEST")

  /** (current generation dir or None, pending delta dir names,
    * compacted-batch watermark). The watermark is the highest batchId
    * folded into the generation — the guard that makes a batch REPLAYED
    * after its compaction a no-op instead of a duplicate append (crash
    * between compaction and checkpoint commit is exactly this case).
    */
  def state(dir: String): (Option[String], Seq[String], Long) = {
    val (gen, upto) =
      if (!Files.exists(manifestPath(dir))) (None, -1L)
      else Files.readString(manifestPath(dir)).trim.split("\\s+") match {
        case Array(g, u) => (Some(g), u.stripPrefix("upto=").toLong)
        case Array(g)    => (Some(g), -1L)
        case _           => (None, -1L)
      }
    val root = Paths.get(dir)
    val deltas = if (!Files.exists(root)) Nil else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(root)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("delta-")).toSeq.sorted
      finally s.close()
    }
    (gen, deltas, upto)
  }

  /** The table as of now: clustered generation ∪ pending deltas. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (gen, deltas, _) = state(dir)
    val parts = gen.map(g => s"$dir/$g").toSeq ++ deltas.map(d => s"$dir/$d")
    require(parts.nonEmpty, s"z-ordered table $dir is empty")
    parts.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Start streaming ingest of `rows` into the table at `dir`,
    * clustering on the Morton interleave of (a, b).
    */
  def start(
      rows: DataFrame,
      a: String,
      b: String,
      dir: String,
      ckptDir: String,
      numFiles: Int = 32,
      compactEvery: Int = 4): StreamingQuery = {
    val spark = rows.sparkSession
    rows.writeStream
      .foreachBatch(ingestBatch(spark, a, b, dir, numFiles, compactEvery) _)
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** One micro-batch: delta append, then threshold-triggered compaction.
    * Public for direct spec drive; idempotent under replay.
    */
  def ingestBatch(
      spark: SparkSession,
      a: String,
      b: String,
      dir: String,
      numFiles: Int,
      compactEvery: Int)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val (gen0, _, upto0) = state(dir)
    // replayed batch already folded into the clustered generation
    // (crash between compaction and checkpoint commit): appending it
    // again would duplicate rows — the watermark makes it a no-op
    if (batchId <= upto0) return
    batch.write.mode(SaveMode.Overwrite).parquet(s"$dir/delta-$batchId")
    val (gen, deltas, _) = state(dir)
    if (deltas.size >= compactEvery) {
      val all = (gen.map(g => s"$dir/$g").toSeq ++ deltas.map(d => s"$dir/$d"))
        .map(spark.read.parquet(_)).reduce(_ unionByName _)
      val nextGen = s"zgen-${gen.map(_.stripPrefix("zgen-").toLong + 1).getOrElse(0L)}"
      Layout.writeZOrdered(all, a, b, s"$dir/$nextGen", numFiles)
      val upto = deltas.map(_.stripPrefix("delta-").toLong).max
      // atomic pointer swap, then vacuum the consumed inputs
      val tmp = Paths.get(dir, "_MANIFEST.tmp")
      Files.writeString(tmp, s"$nextGen upto=$upto")
      Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      (gen.toSeq ++ deltas).foreach { d =>
        val p = Paths.get(dir, d)
        val s = Files.walk(p)
        try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
        finally s.close()
      }
    }
  }
}
