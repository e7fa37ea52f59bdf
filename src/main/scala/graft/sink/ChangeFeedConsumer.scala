package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Incremental consumption driver over [[KeyedUpsertSink.readChangesBetween]]:
  * the "process only what changed since the last run" loop a
  * training-data pipeline runs instead of re-reading 100 TB. Tracks the
  * last processed version in a checkpoint file and hands each new
  * version range's upserts to `process`.
  *
  * `process` contract: it must SYNCHRONOUSLY consume the batch — run
  * the Spark action (write, collect, upsert) before returning. A
  * callback that stashes the lazy DataFrame or kicks off async work
  * lets the checkpoint advance past an unprocessed range, silently
  * degrading the at-least-once guarantee to at-most-once.
  *
  * Crash contract: the checkpoint advances AFTER `process` returns, so
  * a consumer that dies mid-range replays that range on restart —
  * at-least-once, which an idempotent downstream (an LWW sink, the norm
  * in this engine) absorbs to effectively-once. The checkpoint write is
  * the sink's own audited primitive (write-fsync + atomic rename +
  * directory fsync, unique tmp per attempt), so a torn or
  * concurrently-stomped checkpoint cannot exist.
  *
  * Retention contract: `fromVersion` must still be inside the table's
  * vacuum keep window. A consumer stalled past it fails LOUDLY
  * (manifestAt's documented error) rather than silently skipping the
  * pruned history — re-bootstrap deliberately via [[bootstrap]] with
  * `force = true`.
  */
object ChangeFeedConsumer {

  /** None = no checkpoint file. A file that EXISTS but does not parse
    * is a loud error, not None: conflating corruption with absence
    * would steer the operator into a silent whole-table re-bootstrap —
    * the exact hazard the bootstrap guard exists to prevent.
    */
  private[sink] def readCheckpoint(p: Path): Option[Long] = {
    if (!Files.exists(p)) return None
    val raw = new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim
    Some(raw.toLongOption.getOrElse(throw new IllegalStateException(
      s"$p: checkpoint file exists but does not parse as a version " +
        s"(content: '${raw.take(40)}') — refusing to treat corruption " +
        "as a fresh consumer; repair or delete the file deliberately")))
  }

  private[sink] def writeCheckpoint(p: Path, v: Long): Unit = {
    // unique tmp per attempt: a constant name lets two misconfigured
    // writers interleave truncate/write/rename into an empty publish
    val tmp = p.resolveSibling(
      s".${p.getFileName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    KeyedUpsertSink.writeFsynced(tmp,
      s"$v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // make the rename itself durable — same discipline as the manifest
    KeyedUpsertSink.fsyncDir(p.getParent)
  }

  /** The table's current head, failing loudly when the table has no
    * versions (mistyped path, deleted or recreated table) — `.max` on
    * an empty listing would crash with a context-free 'empty.max'.
    */
  private def headOf(tablePath: String): Long = {
    val versions = KeyedUpsertSink.tableVersions(tablePath)
    if (versions.isEmpty) throw new IllegalStateException(
      s"$tablePath has no committed versions — wrong path, or the table " +
        "was deleted/recreated since this consumer's checkpoint")
    versions.max
  }

  /** First run: hand the WHOLE resolved table (at the current head) to
    * `process` and checkpoint that head. Returns the bootstrapped head,
    * or None when the table has no commits yet.
    *
    * Refuses to run over an existing checkpoint unless `force = true`:
    * an accidental second bootstrap would silently reprocess the whole
    * table — re-bootstrap must be deliberate.
    */
  def bootstrap(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], checkpointPath: String,
      force: Boolean = false)(process: DataFrame => Unit): Option[Long] = {
    val ckpt = Paths.get(checkpointPath)
    readCheckpoint(ckpt).foreach { v =>
      require(force,
        s"$checkpointPath already holds checkpoint v$v — bootstrapping " +
          "again reprocesses the WHOLE table; pass force = true to do " +
          "that deliberately")
    }
    val versions = KeyedUpsertSink.tableVersions(tablePath)
    if (versions.isEmpty) return None
    val head = versions.max
    process(KeyedUpsertSink.readBucketedDelta(
      spark, tablePath, keys, order, atVersion = Some(head)))
    writeCheckpoint(ckpt, head)
    Some(head)
  }

  /** One poll: process the upserts between the checkpointed version and
    * the current head, then advance the checkpoint. Returns the
    * (from, to] range processed; None when nothing new committed (the
    * idle steady state — `process` is NOT called) or the consumer has
    * never bootstrapped (call [[bootstrap]] first; deliberate, so a
    * fresh consumer cannot silently treat 100 TB of history as "one
    * change batch" by accident).
    */
  def processNew(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], checkpointPath: String)(
      process: DataFrame => Unit): Option[(Long, Long)] = {
    val ckpt = Paths.get(checkpointPath)
    val last = readCheckpoint(ckpt).getOrElse(throw new IllegalStateException(
      s"$checkpointPath: no checkpoint — bootstrap the consumer first " +
        "(a fresh consumer must not silently process the whole history " +
        "as one change batch)"))
    val head = headOf(tablePath)
    if (head == last) return None
    // a head BELOW the checkpoint is a recreated table, not a reversed
    // range — name the real problem instead of readChangesBetween's
    // range require
    if (head < last) throw new IllegalStateException(
      s"$tablePath head is v$head but this consumer's checkpoint is " +
        s"v$last — the table was recreated (or its history replaced) " +
        "since the last poll; re-bootstrap deliberately (force = true)")
    process(KeyedUpsertSink.readChangesBetween(
      spark, tablePath, keys, order, fromVersion = last,
      toVersion = Some(head)))
    writeCheckpoint(ckpt, head)
    Some((last, head))
  }
}
