package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated corpus (TESTDATA.md): TPC-H-ish star
  * schema + `events` stream table + `documents`/`embeddings` for the
  * training-data-pipeline operators.
  *
  * Scale notes: every loader is a plain parquet scan — Catalyst pushes
  * filters and prunes columns into the `FileScan`, so callers should
  * filter/select as early as possible and never cache here. On a real
  * cluster these paths would be object-store URIs; nothing else changes.
  */
object Tables {

  /** The `events` table is written with parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects unless nanos are surfaced as raw
    * longs. We read nanos-as-long and expose typed views below.
    */
  def withNanos(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    withNanos(spark).read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every corpus table as a temp view (plus `events` with its
    * derived µs/ms/timestamp columns), so the whole engine surface is
    * reachable from `spark.sql("SELECT ... FROM lineitem ...")` exactly
    * like from the DataFrame API.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => table(spark, dir, t).createOrReplaceTempView(t))
    events(spark, dir).createOrReplaceTempView("events")
  }

  /** `events` with the nano-epoch `ts` kept as a long (`ts_ns`) plus
    * derived, oracle-friendly forms. IMPORTANT precision note: DuckDB reads
    * parquet TIMESTAMP(NANOS) truncated to MICROsecond precision, so every
    * cross-engine-visible ordering or arithmetic must use `ts_us`
    * (= `epoch_us(ts)` in DuckDB, exactly), never raw nanos.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts_ns div 1000")))
}
