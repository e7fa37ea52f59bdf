package graft

import graft.functions.GraftFunctions

/** The custom kernels must be reachable from plain SQL. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("scalar kernels work from spark.sql") {
    GraftFunctions.register(spark)
    Seq(("a b c d", "b c d e")).toDF("x", "y").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT graft_jaccard(
        |  graft_hash_set(graft_word_shingles(split(x, ' '), 2)),
        |  graft_hash_set(graft_word_shingles(split(y, ' '), 2))) AS j,
        | graft_simhash(split(x, ' ')) AS sh,
        | size(graft_minhash(split(x, ' '), 16)) AS nperm
        |FROM t""".stripMargin).head()
    // bigrams: {a b, b c, c d} vs {b c, c d, d e} -> J = 2/4
    assert(math.abs(row.getDouble(0) - 0.5) < 1e-12)
    assert(row.getLong(1) != 0L)
    assert(row.getInt(2) == 16)
  }

  test("threshold-gated jaccard and prefix selection work from spark.sql") {
    GraftFunctions.register(spark)
    Seq(("a b c d", "b c d e")).toDF("x", "y").createOrReplaceTempView("tg")
    val row = spark.sql(
      """SELECT
        |  graft_jaccard_threshold(
        |    graft_hash_set(graft_word_shingles(split(x, ' '), 2)),
        |    graft_hash_set(graft_word_shingles(split(y, ' '), 2)), 0.4) AS jlo,
        |  graft_jaccard_threshold(
        |    graft_hash_set(graft_word_shingles(split(x, ' '), 2)),
        |    graft_hash_set(graft_word_shingles(split(y, ' '), 2)), 0.9) AS jhi,
        |  size(graft_jaccard_prefix(
        |    graft_hash_set(graft_word_shingles(split(x, ' '), 2)),
        |    array(CAST(0 AS BIGINT)), 0.6)) AS plen
        |FROM tg""".stripMargin).head()
    // J = 2/4: survives t=0.4 with the exact score, early-exits t=0.9
    assert(math.abs(row.getDouble(0) - 0.5) < 1e-12)
    assert(row.getDouble(1) == -1.0)
    // 3 distinct bigrams, t=0.6: prefix length 3 - 2 + 1 = 2
    assert(row.getInt(2) == 2)
  }

  test("threshold accepts whole-number literals; unsorted heavy-hitter arrays are corrected") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_jaccard_threshold(array(1L, 2L), array(1L, 2L), 1) AS jint,
        |  graft_jaccard_prefix(array(3L, 5L, 9L), array(9L, 3L), 0.6) AS pu,
        |  graft_jaccard_prefix(array(3L, 5L, 9L), array(3L, 9L), 0.6) AS ps
        |""".stripMargin).head()
    // identical sets survive an integer threshold of 1 with J = 1.0
    assert(row.getDouble(0) == 1.0)
    // the unsorted heavy-hitter set classifies identically to the sorted
    // one: rare 5 first, then the earliest heavy hitter 3 (L = 2)
    assert(row.getSeq[Long](1) == Seq(5L, 3L))
    assert(row.getSeq[Long](1) == row.getSeq[Long](2))
  }

  test("graft_top_k aggregate works from spark.sql") {
    GraftFunctions.register(spark)
    (1 to 100).map(i => (i % 5, i)).toDF("g", "v").createOrReplaceTempView("s")
    val got = spark.sql(
      """SELECT g, transform(graft_top_k(struct(v), 2), r -> r.v) AS top
        |FROM s GROUP BY g""".stripMargin)
      .as[(Int, Seq[Int])].collect().toMap
    assert(got(0) == Seq(100, 95))
    assert(got(4) == Seq(99, 94))
  }

  test("registered views give full Spark SQL access; SQL q1 equals DataFrame q1") {
    Tables.registerViews(spark, Sf0001)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSet
    val df = graft.analytics.Queries.q1PricingSummary(spark, Sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(sql == df)
    // the events view exposes the derived time columns too
    assert(spark.sql("SELECT max(ts_ms) FROM events").head().getLong(0) > 0)
  }

  test("graft_repetition_stats from SQL matches the kernel contract") {
    GraftFunctions.register(spark)
    Seq("buy now buy now buy now").toDF("x").createOrReplaceTempView("r")
    val st = spark.sql("SELECT graft_repetition_stats(split(x, ' ')) FROM r")
      .head().getSeq[Long](0)
    assert(st == Seq(6L, 3L, 5L, 3L))
  }

  test("graft_fvec_dot from SQL equals Column API") {
    GraftFunctions.register(spark)
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("v")
    assert(spark.sql("SELECT graft_fvec_dot(a, b) FROM v").head().getDouble(0) == 32.0)
  }

  test("SQL surface corrects unsorted/duplicated merge-scan inputs instead of misreading") {
    GraftFunctions.register(spark)
    // identical sets in different arrival orders: a raw merge-scan would
    // return 1/3; the registered form normalizes to sorted-distinct first
    assert(spark.sql(
      "SELECT graft_jaccard(array(2L, 1L), array(1L, 2L))")
      .head().getDouble(0) == 1.0)
    assert(spark.sql(
      "SELECT graft_jaccard_threshold(array(2L, 1L, 2L), array(1L, 2L), 0.5)")
      .head().getDouble(0) == 1.0)
    // unsorted doc set: the prefix must come from the canonical
    // (sorted-distinct) image, same as the Column-API pipeline computes
    val p = spark.sql(
      "SELECT graft_jaccard_prefix(array(9L, 3L, 5L, 3L), array(100L), 0.99)")
      .head().getSeq[Long](0)
    assert(p == Seq(3L))
  }
}
