package graft.xform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Model

/** Projections / transforms (SURVEY.md §2.3, P1-P7).
  *
  * The reference's transform Lambda (transform.ts:47-64) splits two CSV
  * strings and zips header[i] -> value[i] into a dynamic string map, then
  * re-wraps the result in a fresh envelope. All of that is a single
  * whole-stage-codegen'd projection here — the Lambda invocation, the JSON
  * (de)serialization, and the bus re-entry all disappear (SURVEY.md §3.2).
  */
object Transform {

  /** P1, bug-compatible flavor (transform.ts:53-61): naive split on ','.
    * Index-zip semantics match the reference: fewer data fields than
    * headers → null values; extra data fields are silently dropped
    * (map_from_arrays requires equal lengths, so we pad/trim explicitly).
    */
  def zipNaive(headers: Column, data: Column): Column = {
    val h = split(headers, ",")
    val d = split(data, ",")
    // pad data with nulls / trim extras so it matches the header count,
    // reproducing JS index-zip behavior (undefined → null; extras dropped);
    // try_element_at, not element_at: ANSI mode errors on out-of-bounds
    val dAligned = transform(h, (_, i) => try_element_at(d, (i + 1).cast(IntegerType)))
    map_from_arrays(h, dAligned)
  }

  /** P1, correct flavor: quote-aware CSV parse via from_csv (fixes the
    * SURVEY.md §1.4 lossy round-trip — `"Main St, Apt 4"` survives).
    */
  def zipCsv(data: Column, headers: Seq[String]): Column = {
    val schema = StructType(headers.map(StructField(_, StringType, nullable = true)))
    from_csv(data, schema, Map.empty[String, String])
  }

  /** P2: envelope wrap (4 sites in the reference — extract:33-47,
    * main.py:42-50, transform.ts:20-31, load.ts:34-47). `detail` is a typed
    * struct; `to_json` happens only at a genuinely external boundary (P7).
    */
  def envelope(detailType: String, detail: Column): Seq[Column] = Seq(
    lit(Model.Source).as("source"),
    lit(detailType).as("detailType"),
    current_timestamp().as("time"),
    detail.as("detail"))

  /** Transform stage: extraction event → transformed event
    * (transform.ts:47-64). detail.data is already a typed map (see
    * CsvExtract.toEvents), so the "zip" is carrying the map forward under
    * the new envelope — the reference's split/zip work is done once at scan.
    */
  def transformStage(extractionEvents: DataFrame): DataFrame =
    extractionEvents.select(envelope(
      Model.DetailTypes.Transform,
      struct(
        lit(Model.Status.Transformed).as("status"),
        col("detail.data").as("data"))): _*)

  /** P3+P4: envelope unwrap + rename/reshape to the fixed storage schema
    * (load.ts:64-73). DynamoDB's `{S: v}` type tags vanish — the Spark
    * schema carries types.
    */
  def toAddress(transformedEvents: DataFrame): DataFrame =
    toRecord(transformedEvents, Model.addressRenames)

  /** Generic P3+P4: unwrap `detail.data` and reshape to a fixed storage
    * schema via a header→column rename map (the load stage's pattern,
    * load.ts:64-73, for any table). Keeps `time` for LWW ordering.
    */
  def toRecord(transformedEvents: DataFrame, renames: Seq[(String, String)]): DataFrame =
    transformedEvents.select(
      renames.map { case (from, to) =>
        // try_element_at, not element_at: ANSI mode THROWS on a missing
        // map key, so one file with a missing/renamed header would kill
        // the load stage — shape drift yields NULL instead (the same
        // fewer-fields→null contract zipNaive implements)
        try_element_at(col("detail.data"), lit(from)).as(to)
      } :+ col("time"): _*)

  /** P7: JSON-serialize the envelope for an external sink (the only place
    * JSON text belongs; inter-stage hops stay typed structs).
    */
  def toWire(events: DataFrame): DataFrame =
    events.select(
      col("source"), col("detailType"), col("time"),
      to_json(col("detail")).as("detail"))

  /** P7 inverse: parse a wire-format envelope back to typed. */
  def fromWire(wire: DataFrame, detailSchema: StructType): DataFrame =
    wire.select(
      col("source"), col("detailType"), col("time"),
      from_json(col("detail"), detailSchema).as("detail"))
}
