package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB regime: bucketing (co-located
  * joins with no exchange) and salting (skew mitigation when AQE's
  * runtime splitting isn't enough).
  *
  * At cluster scale the dominant cost of a fact⋈fact join is the shuffle
  * of both sides. Bucketing pays that shuffle ONCE at write time; every
  * subsequent join/aggregation on the bucket key runs exchange-free.
  * LayoutSpec asserts the exchange-free property on the physical plan.
  */
object Layout {

  /** Write a DataFrame as a bucketed table (sorted within buckets): the
    * one-time key-partitioned layout that makes every later equi-join on
    * `key` co-located.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // a previous JVM may have left the managed location without the (in-
    // memory) catalog entry; clear both or saveAsTable refuses
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. When both sides are
    * bucketed with the same bucket count, Catalyst's EnsureRequirements
    * sees compatible HashPartitioning and inserts NO Exchange.
    */
  def joinBucketed(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted equi-join for skewed keys: replicate the (small-ish) right
    * side `salt` times and scatter the left side's hot keys uniformly,
    * so no single task receives a whole hot key. Semantics are identical
    * to `left.join(right, key)` — verified in LayoutSpec.
    *
    * Use when a key's row count exceeds what one task should hold and
    * the right side is too big to broadcast but cheap to replicate
    * `salt`×; otherwise prefer AQE's skewJoin (enabled by default here).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
