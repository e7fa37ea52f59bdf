package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, PrunedScan, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.sink.KeyedUpsertSink

/** `spark.read.format("graft-table")` — the resolved (LWW) keyed table
  * as a plain SQL-level batch source, with time travel:
  *
  *  - `path` (required): the table root;
  *  - `versionAsOf` (optional): resolve at a historical manifest
  *    version still inside the vacuum keep window (default: the head);
  *  - `keys`/`orderBy` (optional, together or neither): the explicit
  *    spec — defaults to the table's STORED spec, and a mismatched
  *    explicit one is refused loudly (the reader validates).
  *
  * Until now the resolved read was Scala-API-only
  * ([[graft.sink.KeyedUpsertSink.readBucketedDelta]]); this facade
  * gives pure-SQL users the same read. Column pruning pushes through
  * ([[PrunedScan]] — a narrow projection never deserializes the full
  * row width), predicate pushdown deliberately does NOT: the LWW
  * window must see every version-row of a key before a filter may
  * drop it, so filters stay above the resolve (exactly where the
  * library read puts them). Library callers should still prefer
  * `readBucketedDelta` — the DSv1 relation contract routes rows
  * through a Row-typed scan (one InternalRow↔Row round-trip this
  * facade pays and the direct DataFrame does not).
  */
class GraftTableProvider extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    import ChangeFeedSource._
    val path = required(parameters, "path", shortName())
    val (keys, order) = resolveSpec(parameters, shortName())
    val asOf = longOption(parameters, "versionAsOf", shortName())
    val df = KeyedUpsertSink.readBucketedDelta(
      sqlContext.sparkSession, path, keys, order, atVersion = asOf)
    val ctx = sqlContext
    new BaseRelation with PrunedScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      override def buildScan(requiredColumns: Array[String]): RDD[Row] =
        // an empty projection (count(*)) selects zero columns — a valid
        // empty-Row scan; the LWW resolve still runs per key underneath
        df.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
    }
  }
}

/** `df.writeStream.format("graft-upsert")` — the keyed LWW table as a
  * declarative Structured Streaming SINK, closing the format loop the
  * `graft-changes` source opened: `readStream graft-changes →
  * writeStream graft-upsert` is a complete replica pipeline with zero
  * user code.
  *
  * Options:
  *  - `path` (required): the table root;
  *  - `streamId` (required): a stable name for THIS query against this
  *    table — the exactly-once handle (below). Two queries writing the
  *    same table need distinct ids;
  *  - `keys`/`orderBy` (optional, together or neither): explicit spec,
  *    else the table's stored spec (a brand-new table needs the
  *    explicit pair once — the first commit records it);
  *  - `numBuckets` (default 64), `compactAfter` (default 8): the
  *    [[KeyedUpsertSink.upsertBucketedDelta]] knobs.
  *
  * Exactly-once: the engine re-delivers the last uncommitted batch
  * after a crash, so the sink records `stream.<streamId> = batchId` as
  * manifest metadata IN THE SAME optimistic commit as the data (the
  * Delta `txn (appId, version)` discipline on this table's own
  * `#key=value` channel — [[KeyedUpsertSink.upsertBucketedDelta]]'s
  * `extraMeta`), and skips any batch at or below the recorded
  * high-water. Every committer carries head metadata forward, so a
  * compaction between batches cannot lose the marker. Output modes:
  * Append and Update both mean "these rows upsert" (the LWW merge is
  * the update semantics); Complete is refused — replacing the whole
  * table every batch is a different operation (and a trap at scale).
  */
class GraftUpsertSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-upsert"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    import ChangeFeedSource._
    val path = required(parameters, "path", shortName())
    val streamId = required(parameters, "streamId", shortName())
    require(streamId.nonEmpty && !streamId.exists(c =>
        c == '=' || c == '\n' || c == '\r'),
      s"streamId '$streamId' must be non-empty without '=' or line " +
        "breaks (it becomes a manifest metadata key; the committer " +
        "enforces the same rule for any extraMeta)")
    val (keys, order) = resolveSpec(parameters, shortName())
    val numBuckets = intOption(parameters, "numBuckets", shortName())
      .getOrElse(64)
    val compactAfter = intOption(parameters, "compactAfter", shortName())
      .getOrElse(8)
    require(outputMode != OutputMode.Complete(),
      "graft-upsert: Complete mode replaces the WHOLE table every " +
        "micro-batch — not an upsert; use Append or Update (both mean " +
        "\"these rows upsert under the LWW order\")")
    require(partitionColumns.isEmpty,
      "graft-upsert: partitionBy is not supported — the table's layout " +
        "is its key-hash bucketing (numBuckets)")
    val metaKey = s"stream.$streamId"
    // the CHECKPOINT-LIFECYCLE signature. Engine batchIds are
    // per-checkpoint, so a bare `batchId <= high-water` comparison
    // silently drops every batch of a query restarted on a FRESH
    // checkpoint with the same streamId (the new run's ids restart at
    // 0) — and the view tier's own errors tell operators to do exactly
    // that. A uuid persisted once under the checkpoint scopes the
    // marker: same lifecycle → replay skip as before; a different
    // lifecycle's marker is NOT "applied" and the commit overwrites it
    // with the new signature. Lazily bound at the first batch (the
    // engine owns checkpoint creation). Absent a checkpointLocation
    // option (conf-default checkpoints), markers stay unsigned with the
    // documented pre-signature semantics.
    val ckptLoc = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("checkpointLocation") => v
    }
    lazy val runSig: Option[String] = ckptLoc.map { c =>
      val p = ChangeFeedSource.resolveLocalPath(c)
        .resolve("sinks").resolve("graft-upsert-incarnation")
      java.nio.file.Files.createDirectories(p.getParent)
      KeyedUpsertSink.putIfAbsent(p,
        (java.util.UUID.randomUUID().toString + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim
    }
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val spark = data.sparkSession
        // __-prefixed columns are the change feed's ENGINE scratch
        // (__weight retractions, __from/to anchors) — committing them
        // would both store junk columns and, worse, treat a weighted
        // feed's -1 retraction rows as upserts. Refuse with the fix.
        val scratch = data.columns.filter(_.startsWith("__"))
        require(scratch.isEmpty,
          s"graft-upsert: batch carries engine columns " +
            s"[${scratch.mkString(", ")}] — a weighted or " +
            "versionColumns change feed is a RETRACTION stream, not an " +
            "upsert stream; read the upstream feed plain (no " +
            "'weighted'/'versionColumns' options), or drop/transform " +
            "the columns before the sink")
        // REPLAY SKIP — evaluated here for the cheap common case, and
        // re-evaluated by the committer before EVERY commit attempt
        // (abortIf below): a check only out here is check-then-act,
        // and a zombie twin of this query could re-commit the batch
        // and REGRESS the high-water between the check and the commit.
        // Marker format: `<batchId>` (unsigned, pre-signature) or
        // `<batchId>@<checkpoint signature>`; a marker signed by a
        // DIFFERENT checkpoint lifecycle is never "applied" (its batch
        // numbering is unrelated), while an unsigned marker keeps the
        // conservative legacy semantics.
        def applied(meta: Map[String, String]): Boolean =
          meta.get(metaKey).exists { v =>
            val parts = v.split("@", 2)
            val sameLifecycle =
              parts.length < 2 || runSig.forall(_ == parts(1))
            sameLifecycle && parts(0).toLong >= batchId
          }
        if (applied(KeyedUpsertSink.versionedHeadFull(path)._3)) return
        // re-wrap as a batch-tagged leaf: the incoming frame is the
        // streaming plan's (IncrementalExecution) — committing through
        // arbitrary DataFrame ops needs a plain batch plan over the
        // same rows (the ForeachBatchSink move, minus the Row codec)
        val batchDf = org.apache.spark.sql.graft.Bridge.leafDataFrame(
          spark, data.queryExecution.toRdd, data.schema)
        val marker = runSig.fold(batchId.toString)(s => s"$batchId@$s")
        KeyedUpsertSink.upsertBucketedDelta(
          spark, path, keys, order, numBuckets = numBuckets,
          compactAfter = compactAfter,
          extraMeta = Map(metaKey -> marker),
          abortIf = applied)(batchDf, batchId)
        GraftUpsertSinkProvider.onSinkCommit(batchId)
        ()
      }
      override def toString: String = s"GraftUpsertSink[$path]"
    }
  }
}

object GraftUpsertSinkProvider {
  /** Test seam: fires after a batch's table commit, BEFORE the
    * streaming checkpoint commits — the crash window whose replay the
    * metadata high-water absorbs. Production never sets it.
    */
  private[graft] var onSinkCommit: Long => Unit = _ => ()
}
