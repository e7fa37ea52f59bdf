package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.model.Model

/** Sources / scans (SURVEY.md §2.1, S1-S5).
  *
  * The reference's extraction path is: S3 OBJECT_CREATED → SQS → Lambda →
  * Fargate task that downloads the CSV, parses it with a quote-aware
  * reader, and emits ONE EventBridge event PER ROW with the header set
  * denormalized into every event (container/s3DataExtractionTask/main.py:31-52).
  *
  * Spark-first re-expression: the whole chain collapses into a `FileScan`.
  *  - arrival detection (S1, stack.ts:41-57)  → Structured Streaming file
  *    source (new-file listing is built in; `maxFilesPerTrigger` paces).
  *  - download (S3, main.py:22-28)            → implicit in FileSourceScanExec.
  *  - CSV parse w/ header (S4, main.py:31-35) → DataFrameReader.csv,
  *    Univocity parser (quote-correct — fixes SURVEY.md §1.4's lossy
  *    join/split round-trip by parsing exactly once).
  *  - row splinter (S5, main.py:34-52)        → a DataFrame row already IS
  *    the per-row unit; the envelope wrap is a single projection, with zero
  *    per-row RPC (the reference pays one PutEvents API call per row).
  */
object CsvExtract {

  /** All-strings schema: the reference never types anything (SURVEY.md §1.2);
    * even numeric-looking fields stay strings end-to-end (load.ts:67-71).
    */
  def allStringSchema(headers: Seq[String]): StructType =
    StructType(headers.map(StructField(_, StringType, nullable = true)))

  /** S4: batch CSV scan; first row = header = schema (main.py:33). */
  def scan(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false") // all strings, like the reference
      .csv(path)

  /** S4 with a known header set (schema declared, not inferred — cheaper at
    * scale: no extra pass over the file to read headers on every executor).
    */
  def scan(spark: SparkSession, path: String, headers: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .schema(allStringSchema(headers))
      .csv(path)

  /** S5: wrap each parsed row in the reference envelope
    * (`{source, detailType, time, detail:{status, headers, data}}`,
    * main.py:36-50). `data` is a typed map keyed by header — never a
    * re-joined comma string (the §1.4 fix). Header array rides along in
    * each event, matching the reference's schema denormalization.
    */
  def toEvents(rows: DataFrame): DataFrame = {
    val headers = rows.columns.toSeq
    rows.select(
      lit(Model.Source).as("source"),
      lit(Model.DetailTypes.Extraction).as("detailType"),
      current_timestamp().as("time"), // processing time, like main.py:47
      struct(
        lit(Model.Status.Extracted).as("status"),
        typedLit(headers).as("headers"),
        map_from_arrays(
          typedLit(headers),
          array(headers.map(h => col(quoted(h)).cast(StringType)): _*)
        ).as("data")
      ).as("detail"))
  }

  /** S4 with corrupt-record capture: PERMISSIVE parse that routes
    * malformed rows into `_corrupt_record` instead of failing the job or
    * silently corrupting downstream (the reference's transform crashes on
    * shape drift — load.ts:67-71, SURVEY.md §1.3). Callers split on
    * `_corrupt_record IS NULL` — the data-quality quarantine pattern.
    */
  def scanWithQuarantine(spark: SparkSession, path: String, headers: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(allStringSchema(headers).add("_corrupt_record", StringType))
      .csv(path)

  /** S1: streaming arrival. The file source's directory listing is the
    * native analogue of the S3→SQS notification chain (stack.ts:41-57);
    * `maxFilesPerTrigger` plays the role of the reference's concurrency
    * throttle (stack.ts:26, SURVEY.md §2.5 O2).
    */
  def stream(
      spark: SparkSession,
      landingDir: String,
      headers: Seq[String],
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(allStringSchema(headers))
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(landingDir)

  /** Fixed schema of the binaryFile source, declared so the arrival stream
    * never depends on streaming schema inference being enabled.
    */
  private val arrivalSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** S1+S4 with the reference's TRUE schema regime: each arriving file's
    * own header row defines that file's schema at runtime (main.py:33,
    * `headers = next(reader)`; transform.ts:53-61 is schema-agnostic), so
    * one landing directory may hold heterogeneous CSVs. [[stream]] requires
    * a declared header set; this variant closes that gap.
    *
    * Spark's streaming CSV source needs a fixed schema, so the stream here
    * carries file ARRIVALS, not rows: the binaryFile source lists new files
    * (column-pruned to `path` — file bytes are never read by the stream),
    * and the checkpointed foreachBatch handler re-scans each new file in
    * batch mode with per-file header inference. The envelope's
    * `map<string,string>` payload keeps the event schema stable across
    * files with different headers, exactly like the reference's dynamic
    * `TransformedData` map.
    *
    * Scale shape: the only driver-side collect is FILE NAMES per trigger,
    * bounded by `maxFilesPerTrigger` — the analogue of the reference's SQS
    * receive batch (one notification per file) — while each file's parse
    * stays a distributed FileScan.
    */
  def streamDynamicHeaders(
      spark: SparkSession,
      landingDir: String,
      checkpointDir: String,
      process: (DataFrame, Long) => Unit,
      maxFilesPerTrigger: Int = 16): StreamingQuery =
    spark.readStream
      .format("binaryFile")
      .schema(arrivalSchema)
      .option("pathGlobFilter", "*.csv")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
      .select("path")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (files: DataFrame, batchId: Long) =>
        val paths = files.collect().map(_.getString(0))
        // per-file parse guard: a 0-byte / headerless upload (the normal
        // partial-upload failure of the S3-arrival pattern) throws at
        // header read, and the checkpointed retry would replay the SAME
        // batch forever — a permanent wedge. Quarantine the file loudly
        // and keep the stream moving (scanWithQuarantine's rule, applied
        // at file granularity).
        val events = paths.flatMap { p =>
          try Some(toEvents(scan(spark, p)))
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              System.err.println(
                s"[csv-stream] quarantined unparseable $p: ${e.getMessage}")
              None
          }
        }
        events.reduceOption(_.unionByName(_)).foreach(process(_, batchId))
      }
      .start()

  private def quoted(name: String): String = s"`$name`"
}
