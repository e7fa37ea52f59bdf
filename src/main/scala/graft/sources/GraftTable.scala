package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, EqualTo, Filter, In, InsertableRelation, PrunedFilteredScan, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

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
  * ([[PrunedFilteredScan]] — a narrow projection never deserializes
  * the full row width). Predicates stay ABOVE the LWW resolve (the
  * window must see every version-row of a key before a filter may drop
  * it, so every filter is reported unhandled and Spark re-applies it),
  * but KEY-equality filters additionally prune BUCKETS below it: a
  * `WHERE k = 'x'` (or `k IN (...)`, conjunctions across a compound
  * key) routes through [[KeyedUpsertSink.lookupBucketed]] and reads
  * only the buckets the pinned keys hash to — safe because all of a
  * key's version-rows live in its one bucket, so the per-key LWW
  * window is complete there; rows of OTHER keys sharing the bucket are
  * dropped by the re-applied filter. At 100 TB this makes a SQL point
  * lookup O(requested keys), never a table scan. The DSv1 relation
  * contract routes rows through a Row-typed scan (one InternalRow↔Row
  * round-trip the direct DataFrame does not pay) — MEASURED at
  * ×1/×10/×100 (tools/FacadeCostProbe, round 18): full-width resolve
  * wall ratio facade/direct = 0.96/0.96/1.05, i.e. inside noise — the
  * resolve's window dominates and the Row codec never shows, so the
  * facade stays DSv1 deliberately (a DSv2 port would buy nothing
  * measurable here; `readBucketedDelta`/`lookupBucketed` remain the
  * library-callers' direct path).
  *
  * WRITE side (`df.write.format("graft-table")`, and `INSERT INTO` on a
  * `CREATE TABLE ... USING` registration): ONE optimistic LWW commit
  * through [[KeyedUpsertSink.upsertBucketedDelta]], under the full
  * stored-spec/schema handshake — so the zero-code replica story is
  * pure SQL end-to-end. Options: `path` (required); `keys`/`orderBy`
  * (together or neither — a BRAND-NEW table needs them once, the first
  * commit records the spec; on an existing table they default to the
  * stored spec and a mismatched explicit pair is refused);
  * `numBuckets` (default 64) / `compactAfter` (default 8) — the
  * merge-on-read knobs, layout-validated against an existing table.
  *
  * SaveMode contract, decided deliberately:
  *  - `Append` — the ONLY accepted mode, and it means UPSERT: rows
  *    merge under the table's LWW order, exactly the Scala API's
  *    semantics (a keyed table has no blind append).
  *  - `Overwrite` is REFUSED: on this table family "replace everything"
  *    is not one operation — the versioned history, change feeds, and
  *    replicas have no representation for "every prior key vanished"
  *    short of tombstoning each one. A caller who means that writes the
  *    delete explicitly (`option("delete", "true")` below,
  *    [[KeyedUpsertSink.deleteBucketedDelta]], or the weighted stream);
  *    a caller who means "rebuild the fixture" deletes the directory.
  *  - `ErrorIfExists`/`Ignore` are REFUSED: both hinge on an atomic
  *    "does the table exist" decision, but two racing writers would
  *    each observe no table and BOTH commit (the optimistic protocol
  *    serializes commits, not existence checks) — honoring the mode's
  *    contract only probabilistically is worse than refusing it.
  *    `.mode("append")` is an explicit opt-in to upsert semantics.
  *
  * An EMPTY batch is a no-op (no version commits — the committer's own
  * rule), so it cannot CREATE a table: creation is the first
  * data-carrying commit. Engine scratch columns (`__`-prefixed) are
  * refused — a retraction/anchor-carrying frame must be transformed
  * before a batch upsert, same rule as the streaming sink.
  *
  * DELETE verb (`option("delete", "true")`, still `mode("append")`):
  * the batch is a DELETION REQUEST — one tombstone per distinct
  * (key, order) tuple, committed through
  * [[KeyedUpsertSink.deleteBucketedDelta]] with the same stored-spec
  * handshake. The order values rank the tombstone in the LWW chain
  * exactly like the Scala API: a replayed OLDER event still loses, a
  * LATER upsert re-creates the key. SQL itself has no DELETE statement
  * for a DSv1 external relation, so a catalog registration created
  * with `OPTIONS (delete 'true')` IS the SQL delete door — `INSERT
  * INTO that_registration SELECT key, order...` tombstones the
  * selected tuples (reads through it stay plain resolved reads; the
  * option only routes writes). A delete targets an EXISTING table
  * (there is no schema to delete against otherwise — the committer
  * refuses loudly), so it can never create one.
  *
  * DELETE WHERE verb (`option("deleteWhere", "<sql predicate>")`, still
  * `mode("append")`, batch must be EMPTY — the predicate selects the
  * rows): predicate-driven delete through
  * [[KeyedUpsertSink.deleteWhere]] — resolve a pinned snapshot, match
  * the live rows, tombstone each matched (key, order) tuple at the
  * image's OWN order values. Matching nothing commits nothing. The
  * snapshot-vs-commit race window and the exact-duplicate-replay edge
  * are documented on the Scala verb; `delete` and `deleteWhere`
  * together are refused (two different verbs).
  *
  * UPDATE WHERE verb (`option("updateWhere", "<sql predicate>")` +
  * `option("set", "col = expr, ...")`, `mode("append")`, batch EMPTY):
  * predicate-driven update through [[KeyedUpsertSink.updateWhere]] —
  * resolve a pinned snapshot, match live rows, apply the SET
  * expressions (evaluated against the matched image), commit the
  * rewritten images at the image's OWN order values. SET on key or
  * order columns is refused (identity rewrite / self-deranking — see
  * the Scala verb); assignments split on top-level commas only, so
  * `set` expressions may contain function calls.
  *
  * HISTORY verb (`option("history", "true")`): the commit log as a
  * read-only DataFrame ([[KeyedUpsertSink.tableHistory]]) — one row
  * per readable version with the layout width, the merge-on-read
  * chain debt, and the committed `#key=value` metadata verbatim (the
  * DESCRIBE-HISTORY observability the advisors consume, now reachable
  * from pure SQL). Writes through the option refuse; `versionAsOf`
  * does not compose (each row IS a version — filter the column). The
  * log is read PER SCAN (never frozen at registration), so a cached
  * catalog relation tracks the live table.
  *
  * STATS / ADVISE verbs (round 19, read-only, per-scan like HISTORY):
  * `option("stats", "true")` is the physical footprint — one row per
  * bucket (files, bytes, chain_len = [[KeyedUpsertSink.tableStats]]);
  * `option("advise", "true")` is the advisors as rows (rebucket and
  * compact always — compact recommends at chain length `compactAt`,
  * default 8; retention when `consumers` names the lagging readers
  * as `label=version,...`) — healthy rows carry a NULL recommendation,
  * so `WHERE recommendation IS NOT NULL` is the operator's worklist.
  * One read verb per registration.
  *
  * MAINTAIN verb (`option("maintain", "compact"|"purge"|"vacuum")`,
  * `mode("append")`, batch must be EMPTY): the operational actions
  * through the format surface — compact folds chains past `minChain`
  * ([[KeyedUpsertSink.compactBucketChains]]); purge physically drops
  * tombstones matching `purgePredicate`
  * ([[KeyedUpsertSink.purgeTombstones]] — dropping a winning
  * tombstone ends its replay protection, the predicate IS the
  * retention policy); vacuum reclaims unreferenced generations under
  * `graceManifests` ([[KeyedUpsertSink.vacuumGenerations]]). Together
  * with stats/advise/history, the whole table lifecycle — observe,
  * decide, act — runs from pure SQL plus df.write options.
  */
class GraftTableProvider extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  /** The batch write: validate mode + columns, run one upsert commit,
    * hand back a fresh relation pinned at (at least) the new version.
    */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    GraftTableProvider.upsertBatch(
      sqlContext.sparkSession, mode, parameters, data, shortName())
    // re-resolve AFTER the commit: the returned relation must serve the
    // state this write produced, not a pre-write snapshot
    createRelation(sqlContext, parameters - "versionAsOf")
  }

  override def createRelation(
      sqlContext: SQLContext,
      rawParameters: Map[String, String]): BaseRelation = {
    import ChangeFeedSource._
    // a catalog registration (`CREATE TABLE ... USING`) hands the path
    // option back as a `file:` URI — normalize through the one shared
    // rule so the sink's raw-path readers see the same directory
    val parameters = GraftTableProvider.normalizedPath(rawParameters)
    val path = required(parameters, "path", shortName())
    // one READ verb per registration: history/stats/advise each answer
    // a different question; a registration naming two would silently
    // serve whichever this dispatch checks first
    val readVerbs = Seq("history", "stats", "advise").filter(o =>
      booleanOption(parameters, o, shortName()).getOrElse(false))
    require(readVerbs.size <= 1,
      s"graft-table: [${readVerbs.mkString(", ")}] are separate " +
        "read-only verbs — register one table per question")
    // `history` = the DESCRIBE-HISTORY verb: a read-only view of the
    // commit log ([[KeyedUpsertSink.tableHistory]]) — no spec, no
    // resolve, no time travel (each row IS a version)
    if (booleanOption(parameters, "history", shortName())
        .getOrElse(false)) {
      require(!parameters.keys.exists(_.equalsIgnoreCase("versionAsOf")),
        "graft-table: history is the whole readable commit log — " +
          "versionAsOf does not apply (filter the version column)")
      // the commit log is read PER SCAN, not at registration: a catalog
      // registration is cached in Spark's relation cache, so a frozen
      // log would hide every later commit from subsequent queries (and
      // a bare .load() would pay the manifest listing before any
      // action). The fixed schema keeps relation creation free; the
      // never-created-table refusal moves to the first scan.
      val ctx = sqlContext
      return new BaseRelation
          with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = KeyedUpsertSink.TableHistorySchema
        override def buildScan(): RDD[Row] =
          KeyedUpsertSink.tableHistory(ctx.sparkSession, path).rdd
      }
    }
    // `stats` = the physical-footprint view ([[KeyedUpsertSink
    // .tableStats]]): one row per bucket with files/bytes/chain debt —
    // computed PER SCAN like history, so a registration tracks the
    // live table
    if (booleanOption(parameters, "stats", shortName())
        .getOrElse(false)) {
      require(!parameters.keys.exists(_.equalsIgnoreCase("versionAsOf")),
        "graft-table: stats reads the HEAD manifest's physical " +
          "footprint — versionAsOf does not apply")
      val ctx = sqlContext
      return new BaseRelation
          with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = GraftTableProvider.StatsSchema
        override def buildScan(): RDD[Row] = {
          // loud on a never-created/mistyped path — the history verb's
          // contract; "0 buckets" must mean an EMPTY table, not a typo
          KeyedUpsertSink.requireTableState(path)
          val rows = KeyedUpsertSink.tableStats(path).map(s =>
            Row(s.bucket, s.files, s.bytes, s.chainLen.toLong))
          ctx.sparkSession.sparkContext.parallelize(rows, 1)
        }
      }
    }
    // `advise` = the advisors as rows: rebucket always; retention when
    // the `consumers` option names the lagging readers
    // ("label=version,label=version"). Healthy rows carry a null
    // recommendation — `WHERE recommendation IS NOT NULL` is the
    // operator's worklist query.
    if (booleanOption(parameters, "advise", shortName())
        .getOrElse(false)) {
      require(!parameters.keys.exists(_.equalsIgnoreCase("versionAsOf")),
        "graft-table: advise reads the HEAD state — versionAsOf does " +
          "not apply")
      val consumers: Seq[(String, Long)] = parameters.collectFirst {
        case (k, v) if k.equalsIgnoreCase("consumers") => v
      }.map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { e =>
        e.split("=", 2) match {
          case Array(l, p) if p.toLongOption.isDefined && l.nonEmpty =>
            (l, p.toLong)
          case _ => throw new IllegalArgumentException(
            s"graft-table: consumers entry '$e' is not label=version")
        }
      }).getOrElse(Seq.empty)
      val ctx = sqlContext
      return new BaseRelation
          with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = GraftTableProvider.AdviseSchema
        override def buildScan(): RDD[Row] = {
          // a "healthy" verdict for a table that does not exist is the
          // worst possible silent answer — refuse like history does
          KeyedUpsertSink.requireTableState(path)
          // ONE stats walk feeds both advisors — the per-(bucket,
          // generation) directory listing is the verb's whole cost
          val stats = KeyedUpsertSink.tableStats(path)
          val rebucket = KeyedUpsertSink.adviseRebucketWith(path, stats) match {
            case Some(a) => Row("rebucket", false,
              s"rebucketTable(..., ${a.recommendedBuckets})", a.reason)
            case None => Row("rebucket", true, null,
              "bucket count within the hysteresis band of the target")
          }
          // chain debt is the third lifecycle axis (next to layout and
          // retention): recommend a compaction when any bucket's
          // merge-on-read chain EXCEEDS `compactAt` (default = the
          // writers' auto-compaction default, whose own fold fires at
          // chain > compactAfter — so a healthy auto-compacting
          // table's steady-state chain of exactly compactAfter never
          // trips the advisor; writers with compaction OFF surface
          // here before the ChainDriftWarnAt stderr warning would)
          val compactAt = intOption(parameters, "compactAt", shortName())
            .getOrElse(8)
          require(compactAt >= 1,
            s"graft-table: compactAt must be >= 1, got $compactAt " +
              "(a chain of length 1 is a fully-compacted bucket)")
          val longChains = stats.count(_.chainLen > compactAt)
          val maxChain =
            if (stats.isEmpty) 0 else stats.map(_.chainLen).max
          val compact =
            if (longChains > 0) Row("compact", false,
              "maintain='compact'",
              s"$longChains bucket(s) at chain length > $compactAt " +
                s"(max $maxChain) — each read resolves that many " +
                "generations per bucket until compacted")
            else Row("compact", true, null,
              s"max chain length $maxChain within the $compactAt " +
                "threshold")
          val retention = if (consumers.isEmpty) Seq.empty else {
            val a = KeyedUpsertSink.adviseRetention(path, consumers)
            Seq(Row("retention", a.intact,
              if (a.requiredGraceManifests > 0 || !a.intact)
                s"vacuum with graceManifests >= ${a.requiredGraceManifests}"
              else null,
              a.reason))
          }
          ctx.sparkSession.sparkContext
            .parallelize(Seq(rebucket, compact) ++ retention, 1)
        }
      }
    }
    val (keys, order) = resolveSpec(parameters, shortName())
    val asOf = longOption(parameters, "versionAsOf", shortName())
    // resolve the version ONCE and feed it to BOTH routes: reading the
    // head twice (an eager readBucketedDelta, then a second listing for
    // the lookup pin) lets a commit land in between, and one relation
    // would serve two table states depending on which route a filter
    // took. On a version-less table (no committed versions, or a plain
    // pre-versioning manifest) pruning is disabled — the full scan is
    // the only route with a coherent snapshot to serve.
    val pinned = asOf.orElse(KeyedUpsertSink.tableVersions(path).lastOption)
    val df = KeyedUpsertSink.readBucketedDelta(
      sqlContext.sparkSession, path, keys, order, atVersion = pinned)
    val ctx = sqlContext
    new BaseRelation with PrunedFilteredScan with InsertableRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      // `INSERT INTO` on a catalog registration of this table
      // (`CREATE TABLE t USING graft-table OPTIONS (path ...)`): the
      // same one-commit upsert as df.write. INSERT OVERWRITE is refused
      // for the Overwrite reasons on the provider scaladoc. NOTE the
      // DSv1 snapshot contract: a relation instance serves the version
      // pinned at its creation, and the session catalog CACHES the
      // instance it resolved at CREATE TABLE — so an in-session SELECT
      // after INSERT INTO needs `REFRESH TABLE t` (the standard DSv1
      // external-table discipline) to see the new version; fresh
      // sessions resolve the head.
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        // a versionAsOf registration is a read-only HISTORICAL view:
        // an INSERT would silently commit to the head while this
        // relation keeps serving the pinned old version — refuse
        require(asOf.isEmpty,
          "graft-table: INSERT INTO a versionAsOf registration is " +
            "refused — the relation serves a pinned historical " +
            "version; register the table without versionAsOf to write")
        GraftTableProvider.upsertBatch(ctx.sparkSession,
          if (overwrite) SaveMode.Overwrite else SaveMode.Append,
          parameters, data, "graft-table")
      }
      // key filters prune BUCKETS only — a bucket holds many keys — so
      // every filter is re-applied by Spark above the scan
      override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
        filters
      override def buildScan(requiredColumns: Array[String],
          filters: Array[Filter]): RDD[Row] = {
        val spark = ctx.sparkSession
        val base = (if (pinned.isEmpty) None
          else GraftTableProvider
            .keyRequest(spark, df.schema, keys, filters)) match {
          case Some(req) =>
            GraftTableProvider.onTableRoute("pruned")
            KeyedUpsertSink.lookupBucketed(
              spark, path, keys, order, req, atVersion = pinned)
          case None =>
            GraftTableProvider.onTableRoute("full")
            df
        }
        // an empty projection (count(*)) selects zero columns — a valid
        // empty-Row scan; the LWW resolve still runs per key underneath
        base.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
      }
    }
  }
}

object GraftTableProvider {
  /** `option("stats", "true")`'s fixed schema — one row per bucket. */
  val StatsSchema: StructType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("files", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("chain_len", LongType, nullable = false)))

  /** `option("advise", "true")`'s fixed schema — one row per advisor;
    * healthy rows carry a null recommendation.
    */
  val AdviseSchema: StructType = StructType(Seq(
    StructField("advisor", StringType, nullable = false),
    StructField("healthy", BooleanType, nullable = false),
    StructField("recommendation", StringType, nullable = true),
    StructField("reason", StringType, nullable = false)))

  /** The shared one-commit batch upsert behind `df.write` and
    * `INSERT INTO` — mode/column validation, then
    * [[KeyedUpsertSink.upsertBucketedDelta]] with the stored-spec and
    * schema handshakes (an explicit spec mismatching the stored one, a
    * layout mismatch, or an incompatible schema all refuse loudly in
    * the committer). batchId is not meaningful for a one-shot batch
    * write; the generation name's uuid suffix keeps commits distinct.
    */
  /** Normalize the `path` option through [[ChangeFeedSource.resolveLocalPath]]
    * (catalog registrations hand it back as a `file:` URI; the sink's
    * raw-path readers need the filesystem path).
    */
  private[graft] def normalizedPath(
      parameters: Map[String, String]): Map[String, String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") =>
      parameters.updated(k, ChangeFeedSource.resolveLocalPath(v).toString)
    }.getOrElse(parameters)

  private[graft] def upsertBatch(spark: SparkSession, mode: SaveMode,
      rawParameters: Map[String, String], data: DataFrame,
      format: String): Unit = {
    import ChangeFeedSource._
    val parameters = normalizedPath(rawParameters)
    val path = required(parameters, "path", format)
    // MAINTAIN verb (round 19): the operational actions — compact /
    // purge / vacuum — through the format surface, so a pure-SQL
    // operator can run the whole table lifecycle the advisors inform
    // (the HISTORY/stats/advise verbs are the read half). The batch
    // must be EMPTY (an action takes options, not rows) and composes
    // with no other verb; each action validates its own option set.
    val maintain = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maintain") => v.trim.toLowerCase
    }
    if (maintain.isDefined) {
      val action = maintain.get
      require(mode == SaveMode.Append,
        s"$format: maintain='$action' runs under mode(\"append\") like " +
          "every other verb on this surface (the mode carries no " +
          "meaning here; refusing the others keeps one rule)")
      val conflicts = Seq("delete", "deleteWhere", "updateWhere", "set",
        "history", "stats", "advise", "versionAsOf").filter(o =>
        parameters.keys.exists(_.equalsIgnoreCase(o)))
      require(conflicts.isEmpty,
        s"$format: maintain does not compose with " +
          s"[${conflicts.mkString(", ")}] — one verb per write")
      require(data.isEmpty,
        s"$format: maintain batches must be EMPTY — the action takes " +
          "options (minChain, purgePredicate, graceManifests), not rows")
      action match {
        case "compact" =>
          val (keys, order) = resolveSpec(parameters, format)
          val minChain = intOption(parameters, "minChain", format)
            .getOrElse(2)
          KeyedUpsertSink.compactBucketChains(spark, path, keys, order,
            minChain = minChain)
        case "purge" =>
          val (keys, order) = resolveSpec(parameters, format)
          val pred = parameters.collectFirst {
            case (k, v) if k.equalsIgnoreCase("purgePredicate") => v
          }.getOrElse(throw new IllegalArgumentException(
            s"$format: maintain='purge' needs option purgePredicate — " +
              "the SQL predicate over KEY/ORDER columns selecting which " +
              "tombstones are old enough to physically drop (tombstone " +
              "rows null-fill everything else; an always-true predicate " +
              "drops every winning tombstone and ends its replay " +
              "protection — see purgeTombstones)"))
          require(pred.trim.nonEmpty,
            s"$format: maintain='purge' purgePredicate is empty — an " +
              "empty predicate matches nothing; spell the retention rule")
          KeyedUpsertSink.purgeTombstones(spark, path, keys, order,
            org.apache.spark.sql.functions.expr(pred))
        case "vacuum" =>
          // no spec needed: vacuum works from the manifest chain alone
          // (and must keep working on a pre-spec table)
          val grace = intOption(parameters, "graceManifests", format)
            .getOrElse(0)
          require(grace >= 0,
            s"$format: graceManifests must be >= 0, got $grace")
          // the dwell guard for in-flight stagings; lower it only on a
          // table you KNOW has no live writers (fixtures, decommission)
          val quiesce = longOption(parameters, "quiesceMs", format)
            .getOrElse(60000L)
          require(quiesce >= 0,
            s"$format: quiesceMs must be >= 0, got $quiesce")
          KeyedUpsertSink.vacuumGenerations(path, graceManifests = grace,
            quiesceMs = quiesce)
        case other => throw new IllegalArgumentException(
          s"$format: unknown maintain action '$other' — one of " +
            "compact, purge, vacuum")
      }
      return
    }
    mode match {
      case SaveMode.Append => ()
      case SaveMode.Overwrite => throw new IllegalArgumentException(
        s"$format: Overwrite would replace the WHOLE keyed table — not " +
          "one operation on a versioned LWW table (history, change " +
          "feeds and replicas have no representation for it short of " +
          "tombstoning every key). Upsert with mode(\"append\"); delete " +
          "explicitly via option(\"delete\", \"true\"), " +
          "deleteBucketedDelta or the weighted stream; " +
          "or delete the table directory to rebuild a fixture")
      case m => throw new IllegalArgumentException(
        s"$format: SaveMode $m hinges on an atomic does-the-table-exist " +
          "decision the optimistic commit protocol cannot serialize " +
          "(two racing writers would both observe no table and both " +
          "commit) — use mode(\"append\"), the explicit opt-in to " +
          "upsert semantics")
    }
    require(!booleanOption(parameters, "history", format).getOrElse(false),
      s"$format: history is a READ-ONLY view of the commit log — " +
        "drop the option to write (the write itself becomes history)")
    Seq("stats", "advise").foreach(o =>
      require(!booleanOption(parameters, o, format).getOrElse(false),
        s"$format: $o is a READ-ONLY maintenance view — writes go " +
          "through the data verbs or maintain='compact|purge|vacuum'"))
    val scratch = data.columns.filter(_.startsWith("__"))
    require(scratch.isEmpty,
      s"$format: batch carries engine columns [${scratch.mkString(", ")}] " +
        "— a weighted or versionColumns change feed is a RETRACTION " +
        "stream, not a batch upsert; drop/transform the columns first " +
        "(the streaming graft-upsert sink consumes weighted feeds)")
    val (keys, order) = resolveSpec(parameters, format)
    // layout default is SELF-DESCRIBING like the spec: an existing
    // table's recorded bucket count wins (a hard 64 default would
    // refuse every path-only append to a table laid out otherwise);
    // an explicit option still validates against it in the committer
    val numBuckets = intOption(parameters, "numBuckets", format)
      .orElse(KeyedUpsertSink.effectiveNumBuckets(path)).getOrElse(64)
    val compactAfter = intOption(parameters, "compactAfter", format)
      .getOrElse(8)
    val delete = booleanOption(parameters, "delete", format)
      .getOrElse(false)
    val deleteWhere = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("deleteWhere") => v
    }
    val updateWhere = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("updateWhere") => v
    }
    val setOpt = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("set") => v
    }
    val verbs = Seq(delete -> "delete", deleteWhere.nonEmpty -> "deleteWhere",
      updateWhere.nonEmpty -> "updateWhere").collect { case (true, n) => n }
    require(verbs.size <= 1,
      s"$format: [${verbs.mkString(", ")}] are different verbs — " +
        "delete tombstones the batch's explicit (key, order) tuples, " +
        "deleteWhere/updateWhere match a predicate against the " +
        "resolved snapshot; pick one")
    require(setOpt.isEmpty || updateWhere.nonEmpty,
      s"$format: option 'set' belongs to the updateWhere verb — " +
        "add option(\"updateWhere\", \"<sql predicate>\") (or \"true\" " +
        "to update every live row)")
    updateWhere match {
      case Some(pred) =>
        require(pred.trim.nonEmpty,
          s"$format: updateWhere needs a SQL predicate (use \"true\" " +
            "to update every live row)")
        val setStr = setOpt.getOrElse(throw new IllegalArgumentException(
          s"$format: updateWhere needs option 'set' — comma-separated " +
            "assignments, e.g. \"quality = quality * 2, flag = 'hot'\""))
        require(data.isEmpty,
          s"$format: updateWhere batches must be EMPTY — the predicate " +
            "selects the rows and 'set' rewrites them; to upsert " +
            "explicit rows use a plain mode(\"append\") write")
        val assignments = GraftTableProvider.splitTopLevel(setStr, ',')
          .map(_.trim).filter(_.nonEmpty).map { a =>
          val i = GraftTableProvider.topLevelAssignEq(a)
          require(i > 0,
            s"$format: set assignment '$a' is not 'column = expression'")
          // a backtick-quoted target (`price.usd` = ...) unwraps to the
          // literal column name the verb's resolver matches against
          val rawName = a.take(i).trim
          val name =
            if (rawName.length >= 2 && rawName.head == '`' && rawName.last == '`')
              rawName.substring(1, rawName.length - 1).replace("``", "`")
            else rawName
          (name, org.apache.spark.sql.functions.expr(a.drop(i + 1).trim))
        }
        require(assignments.nonEmpty,
          s"$format: option 'set' carries no assignments")
        // a duplicate assignment would silently collapse in the map —
        // `SET v = 1, v = 2` is a contradiction, not a last-wins.
        // Locale.ROOT (the Bench rule: tr_TR's dotless-i would let
        // `I`/`i` slip past); case-VARIANT duplicates are additionally
        // refused by the verb itself under the session resolver
        val dup = assignments
          .map(_._1.toLowerCase(java.util.Locale.ROOT))
          .groupBy(identity).collect { case (c, vs) if vs.size > 1 => c }
        require(dup.isEmpty,
          s"$format: column(s) [${dup.mkString(", ")}] assigned more " +
            "than once in 'set' — one assignment per column")
        KeyedUpsertSink.updateWhere(spark, path, keys, order,
          org.apache.spark.sql.functions.expr(pred), assignments.toMap,
          numBuckets = numBuckets, compactAfter = compactAfter)
        return
      case None => ()
    }
    deleteWhere match {
      case Some(pred) =>
        require(pred.trim.nonEmpty,
          s"$format: deleteWhere needs a SQL predicate (e.g. " +
            "\"quality < 0.5\") — an empty one matches nothing by " +
            "definition and is almost certainly a mistake")
        // the predicate DEFINES the rows — a data-carrying batch next to
        // it is ambiguous (which one did the caller mean?), refuse
        require(data.isEmpty,
          s"$format: deleteWhere batches must be EMPTY — the predicate " +
            "selects the rows from the table's own resolved snapshot; " +
            "to delete explicit (key, order) tuples use " +
            "option(\"delete\", \"true\") with the tuples as the batch")
        KeyedUpsertSink.deleteWhere(spark, path, keys, order,
          org.apache.spark.sql.functions.expr(pred),
          numBuckets = numBuckets, compactAfter = compactAfter)
      case None if delete =>
        KeyedUpsertSink.deleteBucketedDelta(spark, path, keys, order,
          numBuckets = numBuckets, compactAfter = compactAfter)(data, 0L)
      case None =>
        KeyedUpsertSink.upsertBucketedDelta(spark, path, keys, order,
          numBuckets = numBuckets, compactAfter = compactAfter)(data, 0L)
    }
    ()
  }

  /** Split `s` on `sep` at paren/bracket/quote depth zero — the SQL
    * `set` option's assignments separate on commas, but an assignment's
    * EXPRESSION may itself contain commas (`coalesce(a, b)`); a naive
    * split would shear it.
    */
  private[graft] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur += c
        // SQL escapes a quote by doubling it — '' stays inside the string
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) {
            cur += quote; i += 1
          } else quote = 0
        }
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '(' | '[' => depth += 1; cur += c
        case ')' | ']' => depth -= 1; cur += c
        case x if x == sep && depth == 0 => out += cur.result(); cur.clear()
        case x => cur += x
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Index of the assignment's `=` in `column = expression` — the first
    * top-level `=` that is not part of `<=`, `>=`, `!=`, `==` (those
    * belong to the expression side of some OTHER assignment only if the
    * caller split wrongly; within one assignment the first bare `=` IS
    * the assignment). Returns -1 when there is none.
    */
  private[graft] def topLevelAssignEq(a: String): Int = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < a.length) {
      val c = a.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case '=' if depth == 0 =>
          val prevOk = i == 0 || !"<>!=".contains(a.charAt(i - 1))
          val nextOk = i + 1 >= a.length || a.charAt(i + 1) != '='
          if (prevOk && nextOk) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Cross-product bound on the key tuples synthesized from pushed
    * filters: beyond it most buckets are touched anyway (pruning saves
    * nothing) and the predictable full scan wins. Well under
    * [[KeyedUpsertSink.MaxLookupKeys]], so the pruned route can never
    * trip the point-lookup contract's loud refusal.
    */
  private[graft] val MaxPrunedKeyTuples = 1000L

  /** Test seam: which route a facade scan took — "pruned" (key-filter
    * bucket pruning through lookupBucketed) or "full".
    */
  private[graft] var onTableRoute: String => Unit = _ => ()

  /** The key tuples a pushed-filter conjunction pins, as a request
    * frame for [[KeyedUpsertSink.lookupBucketed]] — Some only when
    * EVERY key column is pinned to a finite literal set (`EqualTo` /
    * `In`; several on one column intersect) whose values' external
    * types match the schema (a mismatched class would fail row
    * encoding mid-scan; skipping the pruning is always correct because
    * it is pure optimization — Spark re-applies every filter above the
    * scan). Null literals drop out (`=` and `IN` never match null), and
    * a contradiction (`k='a' AND k='b'`) yields an EMPTY request — a
    * valid, cheap, schema-preserving empty lookup.
    */
  private[graft] def keyRequest(spark: SparkSession, schema: StructType,
      keys: Seq[String], filters: Array[Filter]): Option[DataFrame] = {
    val resolver = spark.sessionState.conf.resolver
    val fields = keys.map(k =>
      schema.fields.find(f => resolver(f.name, k)).getOrElse(return None))
    val sets: Seq[Set[Any]] = fields.map { f =>
      val perFilter = filters.toSeq.collect {
        case EqualTo(a, v) if resolver(a, f.name) =>
          if (v == null) Set.empty[Any] else Set[Any](v)
        case In(a, vs) if resolver(a, f.name) =>
          vs.filter(_ != null).toSet[Any]
      }
      if (perFilter.isEmpty) return None // this key column is unpinned
      val s = perFilter.reduce(_ intersect _)
      if (!s.forall(v => externalTypeMatches(f.dataType, v))) return None
      s
    }
    // clamped running product: a plain Long product over compound-key
    // IN lists can overflow negative and slip past the bound (each
    // factor is an Int-sized set and the accumulator is clamped to
    // bound+1, so no single step can overflow)
    val tupleCount = sets.foldLeft(1L)((acc, s) =>
      math.min(acc * s.size.toLong, MaxPrunedKeyTuples + 1))
    if (tupleCount > MaxPrunedKeyTuples) return None
    val tuples = sets.foldLeft(Seq(Seq.empty[Any])) { (acc, s) =>
      acc.flatMap(t => s.toSeq.map(t :+ _)) // empty set → zero tuples
    }
    val reqSchema = StructType(fields.map(f =>
      StructField(f.name, f.dataType, nullable = true)))
    Some(spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(tuples.map(Row.fromSeq)).asJava), reqSchema))
  }

  /** Conservative filter-value/class admission for the pruned route:
    * exactly the external types Spark's filter conversion emits for
    * each Catalyst type (both datetime APIs). Binary keys are excluded
    * (array equality through a literal set is its own trap) — the full
    * scan handles them as before.
    */
  private def externalTypeMatches(dt: DataType, v: Any): Boolean =
    (dt, v) match {
      case (StringType, _: String) => true
      case (IntegerType, _: java.lang.Integer) => true
      case (LongType, _: java.lang.Long) => true
      case (ShortType, _: java.lang.Short) => true
      case (ByteType, _: java.lang.Byte) => true
      case (DoubleType, _: java.lang.Double) => true
      case (FloatType, _: java.lang.Float) => true
      case (BooleanType, _: java.lang.Boolean) => true
      case (DateType, _: java.sql.Date) => true
      case (DateType, _: java.time.LocalDate) => true
      case (TimestampType, _: java.sql.Timestamp) => true
      case (TimestampType, _: java.time.Instant) => true
      case (_: DecimalType, _: java.math.BigDecimal) => true
      case (_: DecimalType, _: scala.math.BigDecimal) => true
      case _ => false
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
  *    [[KeyedUpsertSink.upsertBucketedDelta]] knobs;
  *  - `weighted` (default false): consume a WEIGHTED change feed
  *    (`readStream graft-changes` with `weighted=true`) — +1 rows
  *    upsert, keys with only -1 rows DELETE
  *    ([[KeyedUpsertSink.deleteBucketedDelta]]). This makes the
  *    zero-code replica delete-complete: a tombstoned upstream refuses
  *    the plain feed, and its weighted feed carries each deletion as
  *    the bare -1 last image. A weighted mirror must begin from a
  *    bootstrap image (`startingVersion=0` or an existing replica) —
  *    a mid-history start whose first batch is a bare deletion has no
  *    schema to delete against and fails loudly. A weighted batch that
  *    carries BOTH upserts and deletions lands as TWO commits (the
  *    upserts, then the deletions — the replay-skip marker rides the
  *    second): between them, or after a crash before the delete until
  *    the stream restarts and replays, replica readers observe a
  *    transient state with the batch's upserts applied but its
  *    deletions not yet — a state the upstream never exposed. The
  *    window is bounded (one commit, or one crash-replay cycle) and
  *    converges to the exact upstream image; a reader that must never
  *    observe it should read the replica with `versionAsOf` pinned to
  *    a marker-carrying version.
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
    // weighted mode: the input is a RETRACTION stream (a weighted
    // graft-changes feed) — +1 rows upsert, keys with ONLY -1 rows
    // delete. This is what makes the zero-code replica DELETE-complete:
    // a tombstoned upstream refuses the plain feed, and its weighted
    // feed carries each deletion as the bare -1 last image.
    val weighted = booleanOption(parameters, "weighted", shortName())
      .getOrElse(false)
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
        // (__weight retractions, __from/to anchors). Plain mode refuses
        // them all (treating a -1 retraction as an upsert corrupts the
        // replica); weighted mode consumes EXACTLY __weight and still
        // refuses the anchor columns.
        val wCol = graft.sources.ChangeFeedSource.WeightCol
        val scratch = data.columns.filter(_.startsWith("__"))
          .filterNot(c => weighted && c == wCol)
        require(scratch.isEmpty,
          s"graft-upsert: batch carries engine columns " +
            s"[${scratch.mkString(", ")}] — " + (if (weighted)
            "weighted mode consumes only __weight; drop/transform the " +
            "anchor columns (versionColumns) before the sink"
          else
            "a weighted or versionColumns change feed is a RETRACTION " +
            "stream, not an upsert stream; read the upstream feed plain " +
            "(no 'weighted'/'versionColumns' options), set this sink's " +
            "weighted=true to mirror deletes, or drop/transform the " +
            "columns before the sink"))
        require(!weighted || data.columns.contains(wCol),
          s"graft-upsert: weighted=true but the batch has no $wCol " +
            "column — read the upstream with option(\"weighted\", " +
            "\"true\") or drop this sink's weighted option")
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
        if (!weighted) {
          KeyedUpsertSink.upsertBucketedDelta(
            spark, path, keys, order, numBuckets = numBuckets,
            compactAfter = compactAfter,
            extraMeta = Map(metaKey -> marker),
            abortIf = applied)(batchDf, batchId)
        } else {
          import org.apache.spark.sql.functions.{abs, coalesce, lit, col => fcol}
          // the split + pairing below evaluates the micro-batch plan
          // several times (anti-join count, then each commit's own
          // read) — persist once, the committer's own discipline
          val cached = batchDf.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
          // loud weight-domain check on the cached batch: the split
          // below keeps ===1 and ===-1 rows, so any other value (a
          // hand-built weighted frame, an upstream that switched to
          // multiplicity weights) would SILENTLY drop rows — the one
          // quiet seam in a sink family that refuses everything else
          // loudly. NULL-safe: abs(null)=1 is null → counted as bad.
          val badWeights = cached
            .filter(!coalesce(abs(fcol(wCol)) === 1L, lit(false))).count()
          require(badWeights == 0L,
            s"graft-upsert: $badWeights row(s) in batch $batchId carry a " +
              s"$wCol outside {1, -1} — a weighted change feed is " +
              "strictly +1 (upsert) / -1 (retraction); transform " +
              "multiplicity-weighted frames before the sink")
          val plus = cached.filter(fcol(wCol) === 1L).drop(wCol)
          // a key with a +1 in the SAME batch is an UPDATE (its -1 is
          // the superseded image); only bare -1 keys are deletions.
          // NULL-SAFE pairing: null key values are legal rows everywhere
          // in this family — a plain equi-join would classify a
          // null-key update's -1 as a deletion and tombstone a key
          // that is live upstream
          val pKeys = plus.select(keys.map(fcol): _*).distinct()
            .select(keys.map(k => fcol(k).as(s"__p_$k")): _*)
          val anti = keys.map(k => fcol(k) <=> fcol(s"__p_$k"))
            .reduce(_ && _)
          val minus = cached.filter(fcol(wCol) === -1L).drop(wCol)
            .join(pKeys, anti, "left_anti")
          val hasMinus = minus.limit(1).count() > 0
          // the replay-skip marker rides the batch's LAST commit: a
          // crash between the upsert and the delete replays the whole
          // batch — the duplicate upsert is content-idempotent under
          // LWW (one extra version, same resolved rows), and the
          // replayed delete then lands WITH the marker. The delete is
          // ranked at the retracted image's own order values: the
          // tombstone generation is later in the chain, so recency
          // breaks the tie toward deletion, while any later re-insert
          // the feed delivers outranks it again.
          if (hasMinus) {
            KeyedUpsertSink.upsertBucketedDelta(
              spark, path, keys, order, numBuckets = numBuckets,
              compactAfter = compactAfter,
              abortIf = applied)(plus, batchId)
            KeyedUpsertSink.deleteBucketedDelta(
              spark, path, keys, order, numBuckets = numBuckets,
              compactAfter = compactAfter,
              extraMeta = Map(metaKey -> marker),
              abortIf = applied)(minus, batchId)
          } else {
            KeyedUpsertSink.upsertBucketedDelta(
              spark, path, keys, order, numBuckets = numBuckets,
              compactAfter = compactAfter,
              extraMeta = Map(metaKey -> marker),
              abortIf = applied)(plus, batchId)
          }
          } finally cached.unpersist()
        }
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
