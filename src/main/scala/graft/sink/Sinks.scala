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
    if (Files.exists(target)) deleteRecursively(target)
    Files.move(staging, target)
  }

  /** Recursive delete that closes its walk stream — same descriptor-leak
    * class as the `Files.list` fixed in [[nonEmptyDir]]; invoked per
    * micro-batch on replace/vacuum paths.
    */
  private def deleteRecursively(root: Path): Unit = {
    val s = Files.walk(root)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally s.close()
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
    * versions and write the result under a FRESH per-attempt generation
    * directory — NOT yet visible to readers. Returns the generation name
    * and the bucket ids actually written for [[commitManifest]]; None for
    * an empty batch. Public so the crash-recovery spec can stage without
    * committing (simulating a writer killed between the bucket writes and
    * the manifest swap).
    *
    * Two redelivery hazards are closed here:
    *  - every attempt stages under its own directory ([[nextGenName]]):
    *    replaying an already-committed batchId must never overwrite the
    *    generation the manifest (and the merge plan's lazy read) still
    *    points at — that overwrite deletes files mid-plan and tears the
    *    table. With unique attempt dirs the replay merges old-vs-new to a
    *    LWW no-op into a new generation and the superseded one becomes
    *    vacuumable garbage, never corruption.
    *  - the batch is pinned (persist + the `touched` action) before the
    *    merge, and the committed bucket list is derived by LISTING the
    *    generation directory after the write — the manifest can only ever
    *    reference `__bucket=N` directories that exist on disk, even if
    *    the upstream batch expression is non-deterministic.
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
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
      val gen = nextGenName(tablePath, batchId)
      merged.drop("__gen")
        .write.mode(SaveMode.ErrorIfExists) // attempt dirs are never reused
        .partitionBy("__bucket")
        .parquet(s"$tablePath/$gen")
      Some((gen, listBucketIds(Paths.get(tablePath, gen))))
    } finally bucketed.unpersist()
  }

  /** First attempt of a batch stages under `gen-<batchId>`; each replay
    * under `gen-<batchId>-r<k>` for the first free k. Attempt dirs are
    * write-once, so a stage never deletes data a live plan or manifest
    * still references.
    */
  private def nextGenName(tablePath: String, batchId: Long): String = {
    val base = s"gen-$batchId"
    if (!Files.exists(Paths.get(tablePath, base))) base
    else {
      var k = 1
      while (Files.exists(Paths.get(tablePath, s"$base-r$k"))) k += 1
      s"$base-r$k"
    }
  }

  /** Bucket ids present on disk under a generation directory. */
  private def listBucketIds(genDir: Path): Seq[Long] = {
    val s = Files.list(genDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("__bucket="))
        .map(_.stripPrefix("__bucket=").toLong)
        .toSeq.sorted
    } finally s.close()
  }

  /** Commit step: point the touched buckets at `gen` via write-tmp +
    * fsync + atomic rename. THE visibility boundary — everything before
    * this is invisible to readers. Also snapshots the committed manifest
    * under `_hist/<gen>` so [[vacuumGenerations]] can grant stalled
    * readers a grace window of prior manifests.
    */
  def commitManifest(tablePath: String, touched: Seq[Long], gen: String): Unit = {
    val next = readManifest(tablePath) ++ touched.map(_ -> gen)
    val body = next.toSeq.sortBy(_._1)
      .map { case (b, g) => s"$b,$g" }.mkString("", "\n", "\n")
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = Paths.get(tablePath, s"_manifest.tmp-$gen")
    writeFsynced(tmp, bytes)
    Files.move(tmp, Paths.get(tablePath, "_manifest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    fsyncDir(Paths.get(tablePath)) // make the rename itself durable
    val hist = Paths.get(tablePath, "_hist")
    Files.createDirectories(hist)
    writeFsynced(hist.resolve(gen), bytes)
  }

  /** Write + force to stable storage, so the atomic rename promotes a
    * fully-persisted file (rename-over-unsynced-data can survive a crash
    * as an empty manifest on some filesystems).
    */
  private def writeFsynced(p: Path, bytes: Array[Byte]): Unit = {
    import java.nio.file.StandardOpenOption._
    val ch = java.nio.channels.FileChannel.open(p, CREATE, WRITE, TRUNCATE_EXISTING)
    try { ch.write(java.nio.ByteBuffer.wrap(bytes)); ch.force(true) }
    finally ch.close()
  }

  /** Best-effort directory fsync (some filesystems refuse opening a
    * directory for read — durability then falls back to the file fsync).
    */
  private def fsyncDir(dir: Path): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(dir, java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: java.io.IOException => () }

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
    * references (superseded or orphaned by a crash), plus stale
    * `_manifest.tmp-*` files a writer crash left behind.
    *
    * `graceManifests` guards stalled readers: a reader that resolved the
    * manifest just before a superseding commit may still be scanning the
    * old generation when the vacuum runs. With grace N, every generation
    * referenced by any of the N most recent committed manifest snapshots
    * (`_hist/`, ordered by batchId then attempt) is retained in addition
    * to the current one — the reader's whole resolved view survives.
    * Grace 0 reclaims everything unreferenced (the round-5 behavior).
    */
  def vacuumGenerations(tablePath: String, graceManifests: Int = 0): Seq[String] = {
    val dir = Paths.get(tablePath)
    if (!Files.exists(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val live = readManifest(tablePath).values.toSet ++
      recentHistory(dir, graceManifests).flatMap(h => manifestValues(h))
    val s = Files.list(dir)
    val (gens, staleTmp) =
      try {
        val entries = s.iterator().asScala.toList
        (entries.filter(_.getFileName.toString.startsWith("gen-")),
         entries.filter(_.getFileName.toString.startsWith("_manifest.tmp-")))
      } finally s.close()
    // only reclaim tmp files demonstrably ABANDONED: a concurrent writer
    // may be between writeFsynced(tmp) and the atomic rename right now,
    // and deleting its tmp would fail that commit. One minute dwarfs any
    // write-fsync-rename window while still reclaiming crash leftovers.
    val tmpGraceMs = 60000L
    val now = System.currentTimeMillis()
    staleTmp
      .filter(p => now - Files.getLastModifiedTime(p).toMillis > tmpGraceMs)
      .foreach(Files.deleteIfExists(_))
    // prune _hist beyond what the reader grace window needs — a
    // long-running streaming sink otherwise accumulates one snapshot per
    // commit forever (keep a healthy multiple so the window can be
    // widened retroactively)
    pruneHistory(dir, keep = math.max(graceManifests + 1, 16) * 4)
    gens.filterNot(p => live.contains(p.getFileName.toString))
      .sortBy(_.getFileName.toString)
      .map { p => deleteRecursively(p); p.getFileName.toString }
  }

  /** Delete `_hist/` snapshots beyond the newest `keep` (by commit
    * order). Called from vacuum so history stays bounded for long-running
    * sinks.
    */
  private def pruneHistory(dir: Path, keep: Int): Unit = {
    val hist = dir.resolve("_hist")
    if (!Files.exists(hist)) return
    import scala.jdk.CollectionConverters._
    val s = Files.list(hist)
    val snaps = try s.iterator().asScala.toList finally s.close()
    snaps.sortBy(p => genOrder(p.getFileName.toString)).reverse.drop(keep)
      .foreach(Files.deleteIfExists(_))
  }

  /** The `n` most recent `_hist/` manifest snapshots, newest first,
    * ordered by the (batchId, attempt) encoded in the generation name.
    */
  private def recentHistory(dir: Path, n: Int): Seq[Path] = {
    val hist = dir.resolve("_hist")
    if (n <= 0 || !Files.exists(hist)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val s = Files.list(hist)
    val snaps = try s.iterator().asScala.toList finally s.close()
    // the newest snapshot duplicates the current manifest, so reaching n
    // PRIOR committed manifests means taking n+1 snapshots
    snaps.sortBy(p => genOrder(p.getFileName.toString)).reverse.take(n + 1)
  }

  /** Sort key for generation names: `gen-<batchId>` < `gen-<batchId>-r<k>`. */
  private def genOrder(gen: String): (Long, Int) = {
    val parts = gen.stripPrefix("gen-").split("-r", 2)
    (parts(0).toLong, if (parts.length > 1) parts(1).toInt else 0)
  }

  private def manifestValues(p: Path): Set[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala.filter(_.nonEmpty)
      .map(_.split(",", 2)(1)).toSet
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
