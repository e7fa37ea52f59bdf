package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic event source,
  * `spark.read.format("graft-events")` / `spark.readStream.format(...)`.
  *
  * The "event source connector" tier of the engine (SURVEY.md §1.5 — the
  * S3→SQS arrival chain generalizes to any pluggable source): this one
  * synthesizes the familiar events schema on demand, deterministically
  * from (seed, row index), so tests and demos get an unbounded replayable
  * bus without files. It exercises the full connector surface:
  *
  *  - TableProvider → Table (BATCH_READ + MICRO_BATCH_READ)
  *  - ScanBuilder with column pruning (SupportsPushDownRequiredColumns):
  *    unused columns are never generated — the DSv2 analogue of parquet
  *    ReadSchema pruning;
  *  - Batch: row range split into `numPartitions` slices;
  *  - MicroBatchStream: row-count offsets, `rowsPerTrigger` per batch —
  *    the arrival pacing knob (≈ maxFilesPerTrigger ≈ the reference's
  *    concurrency throttle).
  *
  * Options: rows (total, default 1000), users (default 100),
  * numPartitions (default 4), rowsPerTrigger (default 250, streaming),
  * seed (default 42).
  */
class SyntheticEventsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SyntheticEventsTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticEvents {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val eventTypes: Array[UTF8String] =
    Array("click", "view", "signup", "purchase", "error").map(UTF8String.fromString)

  private val BaseTsUs = 1704067200000000L // 2024-01-01T00:00:00Z

  /** Deterministic field generators from (seed, row index) — md5-derived
    * (graft.functions.VecTextKernels.md5Mod60Str) so any engine can
    * regenerate the stream exactly (the source_dsv2_scan oracle does).
    */
  private def h(seed: Long, k: Int, i: Long): Long =
    graft.functions.VecTextKernels.md5Mod60Str(s"evt-$seed-$k-$i")

  def fieldValue(field: String, i: Long, users: Long, seed: Long): Any = field match {
    case "event_id" => java.lang.Long.valueOf(i)
    case "ts_us" => java.lang.Long.valueOf(
      BaseTsUs + i * 1000000L + h(seed, 0, i) % 1000000L)
    case "user_id" => java.lang.Long.valueOf(h(seed, 1, i) % users)
    case "event_type" => eventTypes((h(seed, 2, i) % eventTypes.length).toInt)
    case "value" => java.lang.Double.valueOf(h(seed, 3, i) % 100000L / 100.0)
  }
}

class SyntheticEventsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val rows = options.getLong("rows", 1000L)
  private val users = options.getLong("users", 100L)
  private val numPartitions = options.getInt("numPartitions", 4)
  private val rowsPerTrigger = options.getLong("rowsPerTrigger", 250L)
  private val seed = options.getLong("seed", 42L)

  override def name(): String = s"graft_events($rows rows)"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, users, numPartitions, rowsPerTrigger, seed)
}

class SyntheticScanBuilder(
    rows: Long, users: Long, numPartitions: Int, rowsPerTrigger: Long, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var prunedSchema: StructType = SyntheticEvents.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema
  override def build(): Scan =
    new SyntheticScan(rows, users, numPartitions, rowsPerTrigger, seed, prunedSchema)
}

class SyntheticScan(
    rows: Long, users: Long, numPartitions: Int, rowsPerTrigger: Long,
    seed: Long, pruned: StructType) extends Scan {
  override def readSchema(): StructType = pruned
  override def description(): String =
    s"graft-events rows=$rows pruned=[${pruned.fieldNames.mkString(",")}]"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SyntheticScan.slices(0L, rows, numPartitions, users, seed)
    override def createReaderFactory(): PartitionReaderFactory =
      new SyntheticReaderFactory(pruned)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with streaming.SupportsAdmissionControl {
      private def offset(n: Long): Offset = new Offset {
        override def json(): String = n.toString
      }
      private def n(o: Offset): Long = o.json().toLong
      override def initialOffset(): Offset = offset(0L)
      override def deserializeOffset(json: String): Offset = offset(json.toLong)
      // admission control carries the pacing (latestOffset IS committed as
      // the batch end — trimming in planInputPartitions would drop rows)
      override def getDefaultReadLimit: streaming.ReadLimit =
        streaming.ReadLimit.maxRows(rowsPerTrigger)
      override def latestOffset(start: Offset, limit: streaming.ReadLimit): Offset = {
        val cap = limit match {
          case m: streaming.ReadMaxRows => m.maxRows()
          case _ => rowsPerTrigger
        }
        offset(math.min(rows, n(start) + cap))
      }
      override def reportLatestOffset(): Offset = offset(rows)
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException("uses SupportsAdmissionControl")
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        SyntheticScan.slices(n(start), n(end), numPartitions, users, seed)
      override def createReaderFactory(): PartitionReaderFactory =
        new SyntheticReaderFactory(pruned)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

object SyntheticScan {
  def slices(start: Long, end: Long, numPartitions: Int, users: Long, seed: Long): Array[InputPartition] = {
    val total = math.max(end - start, 0L)
    val per = math.max(1L, (total + numPartitions - 1) / numPartitions)
    (start until end by per).map { s =>
      SyntheticRange(s, math.min(s + per, end), users, seed): InputPartition
    }.toArray
  }
}

case class SyntheticRange(start: Long, end: Long, users: Long, seed: Long)
    extends InputPartition

class SyntheticReaderFactory(pruned: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticRange]
    val fields = pruned.fieldNames
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map(f =>
          SyntheticEvents.fieldValue(f, i, p.users, p.seed)))
      override def close(): Unit = ()
    }
  }
}
