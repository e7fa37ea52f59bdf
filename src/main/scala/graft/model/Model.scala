package graft.model

import org.apache.spark.sql.types._

/** Event envelope detail payload for the extraction stage.
  *
  * Mirrors the reference's inter-stage record (main.py:36-40): every row
  * event carries its header set (schema denormalized into each record,
  * SURVEY.md §1.3). Unlike the reference we carry parsed fields in a typed
  * map instead of a re-joined CSV string — see SURVEY.md §1.4 (lossy
  * round-trip defect, fixed here by design).
  */
case class EtlDetail(status: String, headers: Seq[String], data: Map[String, String])

/** The reference's "tuple header": routing metadata + payload
  * (main.py:42-50; transform.ts:20-31; load.ts:34-47).
  */
case class EtlEvent(
    source: String,
    detailType: String,
    time: java.sql.Timestamp,
    detail: EtlDetail)

/** Terminal stored record — fixed five-string-column schema
  * (reference load.ts:66-72; table keyed by `id`, stack.ts:32-35).
  */
case class Address(
    id: String,
    house_number: String,
    street_address: String,
    town: String,
    zip: String)

object Model {

  /** Constant event source shared by every stage (reference main.py:46,
    * extract/s3SqsEventConsumer.ts:38, transform.ts:23, load.ts:38).
    */
  val Source = "cdkpatterns.the-eventbridge-etl"

  /** Stage detail-types (SURVEY.md §1.1.2). */
  object DetailTypes {
    val EcsStarted = "ecs-started"
    val Extraction = "s3RecordExtraction"
    val Transform  = "transform"
    val Loaded     = "data-loaded"
  }

  /** Stage status markers carried in `detail.status`. */
  object Status {
    val Extracted   = "extracted"
    val Transformed = "transformed"
    val Success     = "success"
  }

  /** Fixed sink schema (reference load.ts:66-72) — all strings; the
    * reference types nothing (SURVEY.md §1.2).
    */
  val addressSchema: StructType = StructType(
    Seq("id", "house_number", "street_address", "town", "zip")
      .map(StructField(_, StringType, nullable = true)))

  /** CSV header → storage column mapping (reference load.ts:67-71). */
  val addressRenames: Seq[(String, String)] = Seq(
    "ID"       -> "id",
    "HouseNum" -> "house_number",
    "Street"   -> "street_address",
    "Town"     -> "town",
    "Zip"      -> "zip")
}
