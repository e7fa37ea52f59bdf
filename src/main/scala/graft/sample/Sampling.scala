package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Random sampling (`df.sample`) is seed- and partitioning-dependent —
  * rerunning a 100 TB job must select the SAME subset, or downstream
  * training sets silently drift between pipeline runs. Both operators here
  * key selection on a content hash (md5 of the key), so the sample is a
  * pure function of the data: reproducible across runs, partitionings,
  * cluster sizes, and engines (md5 hex is engine-independent, which also
  * makes both operators oracle-checkable — xxhash64 would not be).
  *
  * Scale shape: hashBernoulli is a map-side-only filter (no shuffle at
  * all); stratifiedTopN is one shuffle on the stratum key, and with a
  * window top-k Spark's InferWindowGroupLimit prunes to ~N rows per
  * stratum map-side before the shuffle.
  */
object Sampling {

  /** Hex-ordered hash of a key column: the deterministic "random" order. */
  def hashKey(key: Column): Column = md5(key.cast("string"))

  /** Bernoulli-style deterministic sample: keep a row iff the first hex
    * nibble of its key hash falls below `sixteenths` (rate = k/16). A pure
    * map-side filter — the 100 TB plan is scan + filter, nothing else.
    */
  def hashBernoulli(df: DataFrame, key: Column, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16, s"rate must be 0..16/16, got $sixteenths")
    if (sixteenths == 16) df
    else df.filter(substring(hashKey(key), 1, 1) < lit(java.lang.Integer.toHexString(sixteenths)))
  }

  /** Stratified exact-N sample: the N rows per stratum whose key hashes
    * sort first (hash order ≈ uniform-random order, but reproducible).
    * Ties on the (astronomically unlikely) equal hash break by key.
    */
  def stratifiedTopN(df: DataFrame, stratum: Column, key: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(hashKey(key), key)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }
}
