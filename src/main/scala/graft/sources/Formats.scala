package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Columnar-format interop beyond parquet.
  *
  * The reference ingests CSV and lands JSON/DynamoDB items
  * (`container/s3DataExtractionTask/main.py`, `lambda-fns/load`); this
  * engine's storage surface additionally speaks every format Spark
  * ships a vectorized reader for. ORC is the one worth proving — the
  * other columnar wire format a 100 TB lake actually contains — and the
  * round-trip (types, nulls, timestamps survive write→read) is the
  * check that matters, not the API call.
  */
object Formats {

  /** Write `df` as ORC and read it back. Overwrite keeps replays and
    * the determinism audit idempotent. Distributed on both sides: the
    * write is one task per partition, the read is a vectorized
    * columnar scan with the same pushdown surface as parquet.
    */
  def orcRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).orc(path)
    df.sparkSession.read.orc(path)
  }

  /** Write `df` as JSON lines and read it back under the SAME schema.
    * JSON is the reference's landing format (`lambda-fns/load` writes
    * items as JSON documents); the explicit-schema read is the part
    * that matters at scale — schema inference is a full extra pass over
    * the data and can drift run-to-run, so a lake pipeline always pins
    * the schema. Doubles survive exactly (Jackson emits the shortest
    * round-trippable decimal form).
    */
  def jsonRoundtrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }
}
