package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Sinks (SURVEY.md §2.4, K1-K3).
  *
  * K1 — the reference's terminal sink is a DynamoDB PutItem keyed by `id`
  * (load.ts:61-78; stack.ts:32-35): a full-item overwrite, i.e.
  * last-write-wins upsert. That idempotence is what absorbs the pipeline's
  * at-least-once redelivery (SURVEY.md §1.4).
  *
  * K3 — the observe rule taps every event on the bus into an audit log
  * (observe.ts:4-6; stack.ts:276-283).
  */
object KeyedUpsertSink {

  /** Last-write-wins compaction: keep exactly one row per key, the one
    * ranked first by `order` descending (ties broken by the later columns).
    * This is the set-semantics of N PutItem calls against a keyed table.
    *
    * Scale note: one shuffle on the key — the same partitioning a keyed
    * store would impose. Skewed keys are handled by AQE skew-join/agg
    * splitting; no driver-side state.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Streaming upsert via foreachBatch: read-merge-overwrite a parquet
    * table (build environment has no transactional table format on the
    * classpath — SURVEY.md §7.4.4; on a real deployment this body swaps for
    * a Delta/Iceberg MERGE keyed on `keys`).
    *
    * Idempotent per batch replay: merging the same batch twice is a no-op
    * because the merge itself is last-write-wins on `keys` — this upgrades
    * the reference's at-least-once to effectively-once.
    */
  def upsertBatch(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column])(batch: DataFrame, batchId: Long): Unit = {
    val target = Paths.get(tablePath)
    val existing =
      if (nonEmptyDir(target)) Some(spark.read.parquet(tablePath))
      else None

    // New batch outranks existing rows on equal order values: tag a
    // generation column so replays/redeliveries resolve deterministically.
    val tagged   = batch.withColumn("__gen", lit(1L))
    val merged = existing match {
      case Some(old) =>
        latestByKey(
          old.withColumn("__gen", lit(0L)).unionByName(tagged),
          keys,
          order :+ col("__gen"))
      case None => latestByKey(tagged, keys, order)
    }

    val staging = tablePath + s".staging-$batchId"
    merged.drop("__gen").write.mode(SaveMode.Overwrite).parquet(staging)
    replaceDir(Paths.get(staging), target)
  }

  /** Existence probe that closes its directory stream — a bare
    * `Files.list(...).findAny()` leaks one descriptor per micro-batch on
    * a long-running stream.
    */
  private def nonEmptyDir(target: Path): Boolean =
    Files.exists(target) && {
      val s = Files.list(target)
      try s.findAny().isPresent finally s.close()
    }

  private def replaceDir(staging: Path, target: Path): Unit = {
    if (Files.exists(target)) {
      Files.walk(target).sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    }
    Files.move(staging, target)
  }

  /** Hash-bucket partition of the key tuple — the physical layout key for
    * [[upsertBucketed]]. An internal layout detail (never an output
    * value), so the engine-native xxhash64 is fine here.
    */
  def bucketOf(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets.toLong))

  /** Bucketed streaming upsert: the table lives as `__bucket=N/` hash
    * partitions of the key, and each micro-batch rewrites ONLY the
    * buckets it touches (dynamic partition overwrite) — per-trigger cost
    * is O(touched buckets), not O(table). This is the no-Delta answer to
    * the flat [[upsertBatch]]'s known non-scale rewrite: with buckets
    * sized so each holds ~one output-file of keys, a key-local batch
    * rewrites a handful of directories while a 100 TB table stands still.
    * (A transactional format would still be the production choice — this
    * keeps the same layout discipline a bucketed MERGE relies on.)
    *
    * Same LWW/generation semantics as [[upsertBatch]]; replays merge to
    * a no-op. Point lookups prune to one bucket directory
    * ([[readBucketed]] + a `__bucket = bucketOf(...)` filter).
    */
  def upsertBucketed(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int = 64)(batch: DataFrame, batchId: Long): Unit = {
    val bucketed = batch
      .withColumn("__gen", lit(1L))
      .withColumn("__bucket", bucketOf(keys, numBuckets))
    val target = Paths.get(tablePath)
    val tableExists = nonEmptyDir(target)
    val merged =
      if (!tableExists) latestByKey(bucketed, keys, order)
      else {
        // distinct buckets of a micro-batch: a bounded-size (≤ numBuckets)
        // driver list — partition-pruning metadata, not data
        val touched = bucketed.select("__bucket").distinct()
          .collect().map(_.getLong(0))
        val existing = spark.read.parquet(tablePath)
          .filter(col("__bucket").isin(touched: _*)) // prunes to touched dirs
          .withColumn("__gen", lit(0L))
        latestByKey(existing.unionByName(bucketed), keys, order :+ col("__gen"))
      }
    merged.drop("__gen")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic") // replace touched buckets only
      .partitionBy("__bucket")
      .parquet(tablePath)
  }

  /** Read the bucketed table without its layout column. */
  def readBucketed(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath).drop("__bucket")

  // ─────────────────────────── atomic generation-manifest variant ──

  /** Atomic bucketed upsert: [[upsertBucketed]]'s dynamic partition
    * overwrite rewrites touched bucket directories IN PLACE, so a writer
    * dying mid-batch leaves some buckets new and some old — a torn
    * table. This variant writes each batch's merged buckets under a
    * fresh `gen-<batchId>/` directory and then atomically swaps a
    * manifest file mapping every bucket to the generation holding its
    * current version (one POSIX rename — the same generation-pointer
    * discipline a transactional table format uses, minus the format).
    * A crash anywhere before the rename leaves the manifest untouched:
    * readers keep resolving the previous consistent generation set, and
    * the orphaned gen directory is garbage, not corruption (reclaimed by
    * [[vacuumGenerations]]).
    *
    * Same LWW/generation-column merge and O(touched buckets)/trigger
    * cost as [[upsertBucketed]]: the merge reads only the touched
    * buckets' current directories (resolved via the manifest), and the
    * batch replays to a no-op on redelivery.
    */
  def upsertBucketedAtomic(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int = 64)(batch: DataFrame, batchId: Long): Unit = {
    writeGeneration(spark, tablePath, keys, order, numBuckets, batch, batchId) match {
      case Some((gen, touched)) => commitManifest(tablePath, touched, gen)
      case None => () // empty batch: nothing staged, nothing to commit
    }
  }

  /** Stage step: merge the batch against the touched buckets' current
    * versions and write the result under `gen-<batchId>/` — NOT yet
    * visible to readers. Returns the generation name and touched bucket
    * ids for [[commitManifest]]; None for an empty batch. Public so the
    * crash-recovery spec can stage without committing (simulating a
    * writer killed between the bucket writes and the manifest swap).
    */
  def writeGeneration(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int,
      batch: DataFrame,
      batchId: Long): Option[(String, Seq[Long])] = {
    val bucketed = batch
      .withColumn("__gen", lit(1L))
      .withColumn("__bucket", bucketOf(keys, numBuckets))
    // distinct buckets of a micro-batch: bounded (≤ numBuckets) metadata
    val touched = bucketed.select("__bucket").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    if (touched.isEmpty) return None
    val manifest = readManifest(tablePath)
    val existing = readManifestBuckets(spark, tablePath,
      manifest.filter { case (b, _) => touched.contains(b) })
    val merged = existing match {
      case Some(old) =>
        latestByKey(
          old.withColumn("__gen", lit(0L)).unionByName(bucketed),
          keys, order :+ col("__gen"))
      case None => latestByKey(bucketed, keys, order)
    }
    val gen = s"gen-$batchId"
    merged.drop("__gen")
      .write.mode(SaveMode.Overwrite) // replay of the same batchId re-stages
      .partitionBy("__bucket")
      .parquet(s"$tablePath/$gen")
    Some((gen, touched))
  }

  /** Commit step: point the touched buckets at `gen` via write-tmp +
    * atomic rename. THE visibility boundary — everything before this is
    * invisible to readers.
    */
  def commitManifest(tablePath: String, touched: Seq[Long], gen: String): Unit = {
    val next = readManifest(tablePath) ++ touched.map(_ -> gen)
    val body = next.toSeq.sortBy(_._1)
      .map { case (b, g) => s"$b,$g" }.mkString("", "\n", "\n")
    val tmp = Paths.get(tablePath, s"_manifest.tmp-$gen")
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(tablePath, "_manifest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Current bucket → generation mapping; empty before the first commit. */
  def readManifest(tablePath: String): Map[Long, String] = {
    val p = Paths.get(tablePath, "_manifest")
    if (!Files.exists(p)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
        val Array(b, g) = line.split(",", 2)
        b.toLong -> g
      }.toMap
    }
  }

  /** Read the given bucket→gen entries, one scan per distinct generation
    * (basePath keeps the `__bucket=N` partition column), cast back to the
    * writer's long type. None when no entry exists yet.
    */
  private def readManifestBuckets(
      spark: SparkSession,
      tablePath: String,
      entries: Map[Long, String]): Option[DataFrame] =
    if (entries.isEmpty) None
    else Some(entries.groupBy(_._2).map { case (gen, buckets) =>
      spark.read.option("basePath", s"$tablePath/$gen")
        .parquet(buckets.keys.toSeq.sorted.map(b => s"$tablePath/$gen/__bucket=$b"): _*)
        .withColumn("__bucket", col("__bucket").cast("long"))
    }.reduce(_ unionByName _))

  /** Read the atomic table at its current manifest, without the layout
    * column.
    */
  def readBucketedAtomic(spark: SparkSession, tablePath: String): DataFrame = {
    val manifest = readManifest(tablePath)
    readManifestBuckets(spark, tablePath, manifest) match {
      case Some(df) => df.drop("__bucket")
      case None => spark.emptyDataFrame
    }
  }

  /** Best-effort reclamation of generation directories no manifest entry
    * references (superseded or orphaned by a crash). Standard snapshot
    * caveat: like any VACUUM, don't run it while a reader resolved
    * against an older manifest is still scanning.
    */
  def vacuumGenerations(tablePath: String): Seq[String] = {
    val live = readManifest(tablePath).values.toSet
    val dir = Paths.get(tablePath)
    if (!Files.exists(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    val gens =
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("gen-"))
        .toList
      finally s.close()
    gens.filterNot(p => live.contains(p.getFileName.toString)).map { p =>
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      p.getFileName.toString
    }
  }
}

/** Date-partitioned event storage: the layout that makes time-ranged
  * queries at 100 TB read only their days (partition pruning at the
  * scan, verified in PartitionedSinkSpec via the PartitionFilters of the
  * physical scan). Hive-style `day=YYYY-MM-DD/` directories.
  */
object PartitionedSink {

  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", date_format(col("ts_utc"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === day)
}

object AuditSink {

  /** K3: the observe channel — union of all stage outputs with a stage tag.
    * In the reference this is the catch-all observeRule delivering every
    * bus event to the observe Lambda (stack.ts:276-283). Union is the
    * Spark-native multicast-listener: no shuffle, partitions concatenate.
    */
  def tap(stages: Map[String, DataFrame]): DataFrame =
    stages
      .map { case (stage, df) =>
        df.select(
          lit(stage).as("stage"),
          col("source"), col("detailType"), col("time"))
      }
      .reduce(_ unionByName _)

  /** The README.md:27 "tally" the reference suggests but never built:
    * reconcile extracted-vs-loaded counts per stage.
    */
  def tally(audit: DataFrame): DataFrame =
    audit.groupBy(col("stage")).agg(count(lit(1)).as("n")).orderBy(col("stage"))
}
