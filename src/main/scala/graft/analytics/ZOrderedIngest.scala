package graft.analytics

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest into a Z-ORDER clustered table with INCREMENTAL
  * re-clustering — the lakehouse `OPTIMIZE ZORDER BY` maintenance loop
  * in plain Spark files, partial-OPTIMIZE included:
  *
  *   - each micro-batch APPENDS to an unclustered `delta-<batchId>/`
  *     region — a cheap parquet write, no clustering work on the ingest
  *     path (ingest latency never pays for layout);
  *   - the clustered part of the table is a SET OF FILES tracked in a
  *     manifest, each with its Morton-range envelope [zmin, zmax] and
  *     row count (computed once, at write time, from the file's own
  *     `__z` column — the column is persisted in clustered files and
  *     dropped on read);
  *   - when pending deltas reach `compactEvery`, compaction rewrites
  *     ONLY the clustered files whose z-envelope contains at least one
  *     delta row's z value: (touched files ∪ all delta rows) re-sort
  *     into fresh range-partitioned files; untouched files carry over
  *     by reference — zero bytes rewritten for them. A delta landing in
  *     new z territory (the common append pattern: new time range)
  *     touches nothing and clusters into its own files, so rewrite
  *     bytes are proportional to delta-overlapped ranges, not table
  *     size (probe-measured in ZOrderedIngestSpec);
  *   - the manifest (`upto=<batchId>` watermark + file entries) swaps
  *     atomically (write-temp + POSIX rename). A crash before the swap
  *     leaves the old manifest: readers keep the previous consistent
  *     view, and half-written files are unreferenced garbage, not
  *     corruption. A crash AFTER the swap but before the vacuum leaves
  *     consumed delta dirs and replaced files on disk — [[state]]
  *     excludes deltas at-or-below the watermark (they are by
  *     definition folded into the clustered part), and the next
  *     [[ingestBatch]] deletes both kinds of straggler as a
  *     self-healing vacuum.
  *
  * Idempotence: a replayed batch overwrites its own `delta-<batchId>`
  * directory (same rows); a batch replayed after its own compaction is
  * dropped by the `upto` watermark; and a compaction replayed after a
  * crash-before-swap deterministically rewrites the same `zw-` dir.
  *
  * Scale shape: reads prune on BOTH filter dimensions via footer
  * min/max inside each clustered file (the Z layout), the unpruned
  * delta tail is bounded by the compaction cadence, and steady-state
  * compaction I/O is O(delta ∪ overlapped files). File-range envelopes
  * may overlap after many partial compactions (an envelope is a
  * bounding interval, holes included) — that costs only extra touches,
  * never correctness, and a naturally-total touch set degrades to the
  * full rewrite that re-tightens every envelope.
  *
  * Fragmentation bound: purely-incremental maintenance would grow the
  * file count without limit (every disjoint-z compaction adds files and
  * never merges old ones). When the post-compaction file count would
  * exceed `maxFiles` (default 4·numFiles), the compaction ESCALATES to
  * a full re-cluster — all files + deltas — which re-tightens every
  * envelope and resets the count to ≈ numFiles (target file size is
  * table-proportional: total rows / numFiles). So steady-state file
  * count is bounded by maxFiles regardless of ingest pattern, and the
  * amortized rewrite cost stays incremental: escalation only fires
  * after ≥ maxFiles − numFiles cheap delta-sized compactions
  * (probe-checked in ZOrderedIngestSpec).
  */
object ZOrderedIngest {

  /** One clustered file: path relative to the table dir, its Morton
    * envelope, and its row count (sizing stats for later compactions).
    */
  final case class ZFile(path: String, zmin: Long, zmax: Long, rows: Long)

  private def manifestPath(dir: String): Path = Paths.get(dir, "_MANIFEST")

  /** (active clustered files, pending delta dir names, compacted-batch
    * watermark). Deltas at-or-below the watermark are EXCLUDED: they are
    * already folded into the clustered files, and listing them (the
    * crash-after-swap-before-vacuum window) would double their rows on
    * read and then permanently on the next compaction.
    */
  def state(dir: String): (Seq[ZFile], Seq[String], Long) = {
    val (files, upto) =
      if (!Files.exists(manifestPath(dir))) (Nil, -1L)
      else {
        val lines = Files.readString(manifestPath(dir)).linesIterator.toSeq
        // the manifest write is tmp+fsync+atomic-rename, so a parse miss
        // is format drift (or hand editing), never a torn write — fail
        // loudly with context instead of a bare NumberFormatException
        val u = lines.headOption.map(_.stripPrefix("upto="))
          .flatMap(_.toLongOption)
          .getOrElse(throw new IllegalStateException(
            s"unrecognized _MANIFEST at $dir: expected first line " +
            s"'upto=<batchId>', got '${lines.headOption.getOrElse("<empty>")}'"))
        val fs = lines.tail.filter(_.nonEmpty).map { l =>
          val Array(p, lo, hi, n) = l.split("\t")
          ZFile(p, lo.toLong, hi.toLong, n.toLong)
        }
        (fs, u)
      }
    val root = Paths.get(dir)
    val deltas = if (!Files.exists(root)) Nil else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(root)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("delta-"))
        .filter(_.stripPrefix("delta-").toLong > upto).toSeq.sorted
      finally s.close()
    }
    (files, deltas, upto)
  }

  /** The table as of now: clustered files ∪ pending deltas. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (files, deltas, _) = state(dir)
    require(files.nonEmpty || deltas.nonEmpty, s"z-ordered table $dir is empty")
    val clustered =
      if (files.isEmpty) None
      else Some(spark.read.parquet(files.map(f => s"$dir/${f.path}"): _*).drop("__z"))
    val pending =
      if (deltas.isEmpty) None
      else Some(deltas.map(d => spark.read.parquet(s"$dir/$d")).reduce(_ unionByName _))
    (clustered.toSeq ++ pending.toSeq).reduce(_ unionByName _)
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
      compactEvery: Int = 4,
      maxFiles: Int = 0): StreamingQuery = {
    val spark = rows.sparkSession
    rows.writeStream
      .foreachBatch(ingestBatch(spark, a, b, dir, numFiles, compactEvery, maxFiles) _)
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  private def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    val s = Files.walk(p)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
    finally s.close()
  }

  /** Straggler cleanup (idempotent, safe any time for a single writer):
    * delta dirs at-or-below the watermark and clustered-write files no
    * manifest references — both are the crash-after-swap-before-vacuum
    * residue, invisible to [[read]] but holding disk.
    */
  private def vacuum(dir: String, files: Seq[ZFile], upto: Long): Unit = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    if (!Files.exists(root)) return
    val l = Files.list(root)
    val entries = try l.iterator().asScala.toSeq finally l.close()
    entries.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("delta-") && n.stripPrefix("delta-").toLong <= upto
    }.foreach(deleteTree)
    val referenced = files.map(f => root.resolve(f.path).normalize).toSet
    entries.filter(_.getFileName.toString.startsWith("zw-")).foreach { zw =>
      val w = Files.walk(zw)
      val leaves = try w.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      finally w.close()
      leaves.filterNot(f => referenced.contains(f.normalize))
        // Spark write-protocol droppings (_SUCCESS, .crc) ride along
        .foreach(Files.delete(_))
      val rest = Files.list(zw)
      val empty = try !rest.iterator().hasNext finally rest.close()
      if (empty) Files.delete(zw)
    }
  }

  /** One micro-batch: delta append, then threshold-triggered INCREMENTAL
    * compaction. Public for direct spec drive; idempotent under replay.
    */
  def ingestBatch(
      spark: SparkSession,
      a: String,
      b: String,
      dir: String,
      numFiles: Int,
      compactEvery: Int,
      maxFiles: Int = 0)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val fileCap = if (maxFiles > 0) maxFiles else 4 * numFiles
    val (files0, _, upto0) = state(dir)
    // replayed batch already folded into the clustered files (crash
    // between compaction and checkpoint commit): appending it again
    // would duplicate rows — the watermark makes it a no-op
    if (batchId <= upto0) return
    vacuum(dir, files0, upto0) // self-heal any crash-window stragglers
    batch.write.mode(SaveMode.Overwrite).parquet(s"$dir/delta-$batchId")
    val (files, deltas, _) = state(dir)
    if (deltas.size >= compactEvery) {
      val deltaDf = deltas.map(d => spark.read.parquet(s"$dir/$d"))
        .reduce(_ unionByName _)
        .withColumn("__z", Layout.morton2(col(a), col(b)))
      // touched = files whose envelope contains ≥1 delta z value. The
      // probe scans only the (small) pending deltas against a broadcast
      // of file-count range rows — never the clustered data.
      val touchedIncr: Set[String] = if (files.isEmpty) Set.empty else {
        import spark.implicits._
        val ranges = broadcast(
          files.map(f => (f.path, f.zmin, f.zmax)).toDF("path", "zmin", "zmax"))
        deltaDf.select(col("__z"))
          .join(ranges, col("__z").between(col("zmin"), col("zmax")))
          .select("path").distinct().as[String].collect().toSet
      }
      val deltaRows = deltaDf.count()
      val activeRows = files.map(_.rows).sum
      // target file size tracks the TABLE (total/numFiles), not the
      // current files' average — a fragmented table of small files must
      // not lower the target and lock the fragmentation in
      val targetRows = math.max(1L, (activeRows + deltaRows) / numFiles)
      def nfFor(rows: Long) =
        math.max(1L, (rows + targetRows - 1) / targetRows).toInt
      // fragmentation bound: escalate to a full re-cluster when the
      // incremental plan would leave more than fileCap files
      val incrCount = files.count(f => !touchedIncr(f.path)) +
        nfFor(files.filter(f => touchedIncr(f.path)).map(_.rows).sum + deltaRows)
      val touched: Set[String] =
        if (incrCount > fileCap) files.map(_.path).toSet else touchedIncr
      val (touchedFiles, untouched) = files.partition(f => touched(f.path))
      val rewriteRows = touchedFiles.map(_.rows).sum + deltaRows
      val nf = nfFor(rewriteRows)
      val rewriteDf = (touchedFiles match {
        case Nil => deltaDf
        case ts => spark.read.parquet(ts.map(t => s"$dir/${t.path}"): _*)
          .unionByName(deltaDf)
      })
      val upto = deltas.map(_.stripPrefix("delta-").toLong).max
      val zwDir = s"zw-$upto"
      rewriteDf
        .repartitionByRange(nf, col("__z"))
        .sortWithinPartitions("__z")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/$zwDir")
      // per-file envelope + rows from the just-written (small) subset
      val written = spark.read.parquet(s"$dir/$zwDir")
        .groupBy(input_file_name().as("f"))
        .agg(min("__z").as("lo"), max("__z").as("hi"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val name = r.getString(0).split("/").last
          ZFile(s"$zwDir/$name", r.getLong(1), r.getLong(2), r.getLong(3))
        }
      val manifest = (s"upto=$upto" +:
        (untouched ++ written).map(f => s"${f.path}\t${f.zmin}\t${f.zmax}\t${f.rows}"))
        .mkString("\n")
      // atomic pointer swap, then vacuum the consumed inputs
      val tmp = Paths.get(dir, "_MANIFEST.tmp")
      Files.writeString(tmp, manifest)
      Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      vacuum(dir, untouched ++ written, upto)
    }
  }
}
