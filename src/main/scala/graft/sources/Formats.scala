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
}
