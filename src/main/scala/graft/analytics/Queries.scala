package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopK

/** Relational analytics showcase — the classical operator categories the
  * reference explicitly lacks (SURVEY.md §2.6: joins, aggregations,
  * windows, top-k, set ops, rollup), built Spark-first so the engine is a
  * complete analytics surface, not just the ETL pipeline.
  *
  * Scale discipline applied throughout:
  *  - dimension joins (`region`/`nation`/`customer` at 100 TB fact scale)
  *    are explicitly `broadcast()` — no shuffle of the fact table;
  *  - aggregates use map-side partials (plain `groupBy`.agg with
  *    associative functions), so shuffles carry groups, not rows;
  *  - windows partition on the natural key (one shuffle, AQE-skew-safe);
  *  - all sums are decimal-exact (see EventAnalytics.dec6 rationale).
  */
object Queries {

  private def dec6(c: Column): Column = c.cast("decimal(18,6)")

  /** Final-output representation rule: aggregates stay decimal-exact
    * internally, but every FINAL decimal column is cast to DOUBLE (and the
    * oracle SQL casts its matching column to DOUBLE) — a parquet DECIMAL
    * surfaces as `decimal.Decimal` via pyarrow but `float64` via DuckDB's
    * `.df()`, so numerically equal results hash differently (the round-2
    * driver flagged exactly this on 16 queries).
    *
    * Rounding caveat (round-3 advice): Spark's decimal→double (Java
    * `BigDecimal.doubleValue`) is correctly rounded, but DuckDB's direct
    * decimal→double is double-rounded (unscaled→double, then /10^scale)
    * and diverges by 1 ulp once the unscaled value exceeds 2^53. The
    * oracle SQL therefore routes every decimal→double through VARCHAR —
    * `CAST(CAST(x AS VARCHAR) AS DOUBLE)` — whose parse is correctly
    * rounded and matches this cast exactly (see the q_window_running
    * oracle and the tools/check_oracle.py selftest).
    */
  private def outDouble(c: Column): Column = c.cast("double")

  /** TPC-H Q1-shaped pricing summary: single scan, partial-agg, tiny
    * shuffle (one group per flag×status). The flagship full-scan agg.
    *
    * Exact ×100 LONG fixed-point sums — the statsQuantityPrice rewrite
    * applied to the flagship (quantity/price/discount carry ≤2 decimal
    * digits; verified slack ≤9e-10 over sf0.1): long partial aggregation
    * is a codegen'd primitive add vs the previous BigDecimal chains.
    * disc_price rows are cents×(100−disc%) — scale 1e4, ≤1.05e9 per row
    * — split hi/lo at 1e8 so group totals hold in a LONG at any
    * plausible sf (ANSI overflow would throw loudly, never corrupt).
    * Output doubles are value-identical to the decimal formulation:
    * both correctly round the same exact rationals.
    */
  /** The shared ×100 LONG fixed-point machinery of the exact revenue /
    * moment sums (error analysis in [[q1PricingSummary]]'s scaladoc):
    * ONE home for the split constant, the hi/lo word decomposition, the
    * exact decimal(38,0) rejoin, and the cents×(100−disc%) revenue
    * product — five queries share the arithmetic, so an envelope change
    * cannot silently diverge one of them.
    */
  private object Fx {
    val split = 100000000L
    /** cents×(100−disc%) of the current lineitem row — scale 1e4. */
    def revenueProduct: Column = {
      val yf = round(col("l_extendedprice") * 100).cast("long")
      val dfac = lit(100L) - round(col("l_discount") * 100).cast("long")
      yf * dfac
    }
    // `/` on longs promotes to double in Spark; the quotient is still
    // exact-to-truncation here (p < 2^53, so the division error ~1e-10
    // never crosses a 1e-8-spaced truncation boundary) and the cast
    // back to long restores the integral hi word
    def hi(p: Column): Column = (p / split).cast("long")
    def lo(p: Column): Column = p % split
    /** Reconstruct the exact integer from summed hi/lo words. */
    def rejoin(hi: Column, lo: Column): Column =
      hi.cast("decimal(38,0)") * lit(split) + lo
    /** Exact rejoin → ONE double cast → back to currency scale. */
    def revenue(hiSum: Column, loSum: Column): Column =
      rejoin(hiSum, loSum).cast("double") / 10000.0
  }

  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val qf = round(col("l_quantity") * 100).cast("long")
    val yf = round(col("l_extendedprice") * 100).cast("long")
    val p = Fx.revenueProduct
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
      .select(col("l_returnflag"), col("l_linestatus"), qf.as("qf"), yf.as("yf"),
        Fx.hi(p).as("p_hi"), Fx.lo(p).as("p_lo"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("qf")).as("sq"), sum(col("yf")).as("sy"),
        sum(col("p_hi")).as("sp_hi"), sum(col("p_lo")).as("sp_lo"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("sq").cast("double") / 100.0).as("sum_qty"),
        (col("sy").cast("double") / 100.0).as("sum_base_price"),
        Fx.revenue(col("sp_hi"), col("sp_lo")).as("sum_disc_price"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-shaped top-k: broadcast the filtered customer dimension into
    * the orders⋈lineitem join, aggregate revenue per order, global top 10.
    * At cluster scale the only big shuffle is lineitem on l_orderkey —
    * orders co-partitions with it; top-k is a tiny sorted limit.
    */
  def q3TopUnshipped(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    // exact ×100 fixed-point revenue (see q1PricingSummary): the per-order
    // sums ride the join as two LONG words; the top-k sort compares the
    // exact integer, so ties and near-ties rank engine-independently
    val p = Fx.revenueProduct
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp_ntz"))
      .select(col("l_orderkey"), Fx.hi(p).as("p_hi"), Fx.lo(p).as("p_lo"))
    li.join(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(sum(col("p_hi")).as("sp_hi"), sum(col("p_lo")).as("sp_lo"))
      .withColumn("rev_fp", Fx.rejoin(col("sp_hi"), col("sp_lo")))
      .orderBy(col("rev_fp").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("orderdate"),
        (col("rev_fp").cast("double") / 10000.0).as("revenue"))
  }

  /** TPC-H Q5-shaped star join: revenue by nation. All four dimension
    * tables broadcast; the fact table never shuffles for the joins —
    * only the final tiny group-by aggregates.
    */
  def q5RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir)
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    // exact ×100 fixed-point revenue rows (see q1PricingSummary): the
    // cents×(100−disc%) product rides the joins as two LONG words
    val p = Fx.revenueProduct
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        Fx.hi(p).as("p_hi"), Fx.lo(p).as("p_lo"))
    li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey")
        && cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(sum(col("p_hi")).as("sp_hi"), sum(col("p_lo")).as("sp_lo"))
      .select(col("n_name"), col("r_name"),
        Fx.revenue(col("sp_hi"), col("sp_lo")).as("revenue"))
      .orderBy("n_name")
  }

  /** Salted skew join, oracle-upgraded from spec-only: lineitem ⋈ part on
    * l_partkey routed through `Layout.saltedJoin` (salt=8), then exact
    * ×100 fixed-point revenue per brand. The salt column scatters each
    * key's rows across 8 sub-keys and replicates the dimension side 8× —
    * the shape that bounds the largest task when one part id dominates the
    * fact table. Semantics must be IDENTICAL to the plain equi-join, and
    * the oracle IS the plain join — a hash match proves the salting is
    * invisible to results, not just to a spec's toy frame.
    */
  def skewJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Fx.revenueProduct
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), Fx.hi(p).as("p_hi"), Fx.lo(p).as("p_lo"))
    val part = Tables.part(spark, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    Layout.saltedJoin(li, part, "l_partkey", 8)
      .groupBy("p_brand")
      .agg(sum(col("p_hi")).as("sp_hi"), sum(col("p_lo")).as("sp_lo"))
      .select(col("p_brand"),
        Fx.revenue(col("sp_hi"), col("sp_lo")).as("revenue"))
      .orderBy("p_brand")
  }

  /** Window ranking: top-3 orders per customer by totalprice (deterministic
    * tie-break on o_orderkey). One shuffle on o_custkey.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        outDouble(dec6(col("o_totalprice"))).as("totalprice"))
  }

  /** Top-k per key via the bounded-heap aggregate (functions/TopKDesc):
    * identical output to topOrdersPerCustomer, but the map side reduces
    * each partition to ≤k rows per group before the exchange — no per-key
    * sort of the full table. The 100 TB form of "rank ≤ k".
    * Tie-break: negated orderkey inside the struct (desc-of-negated =
    * asc orderkey), matching the window query's ordering.
    */
  def topOrdersPerCustomerAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(TopK.top_k_desc(
        struct(col("o_totalprice"), (-col("o_orderkey")).as("neg_key")), k).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rnk"),
        (-col("col.neg_key")).as("o_orderkey"),
        outDouble(dec6(col("col.o_totalprice"))).as("totalprice"))

  /** Running (cumulative) quantity per supplier in shipdate order —
    * analytic frame `rows between unbounded preceding and current row`.
    */
  def runningQtyPerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") < 5)
      .withColumn("running_qty",
        sum(dec6(col("l_quantity"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        outDouble(col("running_qty").cast("decimal(38,6)")).as("running_qty"))
  }

  /** 30-day trailing revenue per customer — the RANGE-frame window
    * (`range between 30 preceding and current row` over a day number),
    * the value-range analytic the ROWS-frame queries cannot express:
    * the frame is defined by ORDER-BY VALUE distance, so same-day peer
    * rows share one frame and the result is row-order-independent by
    * construction — which is also exactly what makes a windowed sum
    * over duplicate keys hash-checkable. Revenue rides as ×100 LONG
    * cents (o_totalprice carries 2 decimals; slack ≤ 4e-9 verified):
    * the frame sum is an exact integer, cast once to double (trailing
    * sums ≪ 2^53) and divided by 100.0 — one IEEE op per row.
    *
    * Scale: one shuffle on o_custkey; within partitions Spark's window
    * range-frame is a sliding two-pointer over the sorted run, O(rows),
    * no per-frame rescans.
    */
  def trailingRevenuePerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("rev30", sum("cents").over(w).cast("double") / lit(100.0))
      .select("o_custkey", "o_orderkey", "day", "rev30")
  }

  /** Rollup (grouping-sets family): counts at (flag,status), (flag), ().
    * Spark and DuckDB agree on ROLLUP null-fill semantics; we mark
    * subtotal levels explicitly to keep the sort keys non-null.
    */
  def rollupCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 100).cast("long").as("qf")) // exact ×100 long (see q1)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("qf")).as("sq"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), (col("sq").cast("double") / 100.0).as("sum_qty"))

  /** Anti join: customers with no orders (NOT EXISTS). Broadcast-safe at
    * any scale where the distinct custkey set of orders fits; otherwise a
    * shuffled left-anti — Catalyst + AQE pick.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000.0)
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Semi join: parts with at least one bulk sale (EXISTS). */
  def partsWithSales(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 48.0)
      .select("l_partkey")
    Tables.part(spark, dir)
      .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_name", "p_brand")
  }

  /** Cube (full grouping-sets lattice) over (flag, status). */
  def cubeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 100).cast("long").as("qf")) // exact ×100 long (see q1)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("qf")).as("sq"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), (col("sq").cast("double") / 100.0).as("sum_qty"))

  /** Explicit GROUPING SETS — the general lattice form rollup and cube
    * are shorthands for: ((flag,status),(flag),(status)) is neither a
    * rollup (no grand total) nor a cube (no () set). One shuffle, the
    * expand happens map-side before the partial agg, so the exchange
    * carries |sets|× the group cardinality (tiny), not |sets|× the data.
    */
  def groupingSetsCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 100).cast("long").as("qf")) // exact ×100 long (see q1)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("qf")).as("sq"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), (col("sq").cast("double") / 100.0).as("sum_qty"))

  /** Quantile sketch (approx_percentile): the constant-memory quantile
    * path for 100 TB distributions (exact median stays oracle-checked in
    * q_median; sketch internals are engine-specific → rows-only). Emitted
    * as three scalar columns, not an ARRAY — the driver's row-sort
    * normalization cannot hash array cells.
    */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        element_at(col("q"), 1).as("p25"),
        element_at(col("q"), 2).as("p50"),
        element_at(col("q"), 3).as("p75"),
        col("n"))

  /** HLL sketch distinct (approx_count_distinct): the constant-memory
    * distinct-count path for 100 TB cardinalities. Sketch internals are
    * engine-specific → rows-only driver check; exactness is covered by
    * q_distinct_agg.
    */
  def approxDistinctParts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("n"))

  /** Quartile assignment (ntile) of orders per status. */
  def orderQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  /** Per-group stddev and correlation, computed from EXACT decimal sums
    * with the double arithmetic only at the very end — built-in
    * stddev/corr accumulate doubles in partition order (engine- and
    * run-dependent); this formulation is deterministic and
    * oracle-hash-stable: identical decimal sums → identical IEEE ops.
    */
  def statsQuantityPrice(spark: SparkSession, dir: String): DataFrame = {
    // Exact LONG fixed-point moment sums — quantity and price carry at
    // most 2 decimal digits, so ×100 integers are exact (verified: the
    // max |x*100 - round(x*100)| over sf0.1 is 9.3e-10 ≪ 0.5). Integer
    // sums are exact and engine-independent like the previous
    // decimal(38,6) formulation, but long partial aggregation is a
    // codegen'd primitive add vs BigDecimal chains — the whole point of
    // the rewrite (q_stats was the slowest shared bench query on decimal
    // cost alone). The two big product moments (price², qty·price) are
    // split hi/lo at 1e8 so their per-group totals stay inside a LONG at
    // any plausible sf (lo ≤ 1e8·n: overflows only past ~9e10 rows;
    // hi ≤ ~1.2e6·n), and reconstructed exactly in decimal(38,0) before
    // the ONE cast to double. ANSI long-sum overflow throws loudly — a
    // scale beyond the documented envelope fails, never returns garbage.
    val qf = round(col("l_quantity") * 100).cast("long")
    val yf = round(col("l_extendedprice") * 100).cast("long")
    val pYY = yf * yf
    val pXY = qf * yf
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), qf.as("qf"), yf.as("yf"),
        (qf * qf).as("p_xx"),
        Fx.hi(pYY).as("yy_hi"), Fx.lo(pYY).as("yy_lo"),
        Fx.hi(pXY).as("xy_hi"), Fx.lo(pXY).as("xy_lo"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("qf")).as("sxf"), sum(col("p_xx")).as("sxxf"),
        sum(col("yf")).as("syf"),
        sum(col("yy_hi")).as("syy_hi"), sum(col("yy_lo")).as("syy_lo"),
        sum(col("xy_hi")).as("sxy_hi"), sum(col("xy_lo")).as("sxy_lo"))
      .select({
        // reconstruct the exact integer moments, then ONE double cast
        // each — identical exact value on both engines → identical IEEE
        // arithmetic downstream
        val dx  = col("sxf").cast("double") / 100.0
        val dxx = col("sxxf").cast("double") / 10000.0
        val dy  = col("syf").cast("double") / 100.0
        val dyy = Fx.rejoin(col("syy_hi"), col("syy_lo")).cast("double") / 10000.0
        val dxy = Fx.rejoin(col("sxy_hi"), col("sxy_lo")).cast("double") / 10000.0
        // ANSI /0 guards: a single-row group breaks stddev's n-1, a
        // constant-valued group zeroes corr's variance product — NULL in
        // both cases (what DuckDB's /0 yields), never a thrown job
        // clamp at 0: a constant-valued group's exact variance is 0, but
        // the two independent roundings in dxx - dx²/n can land ~-1e-10 —
        // sqrt would then yield NaN and the ANSI decimal cast would THROW
        // (DuckDB's stddev_samp of a constant group is exactly 0, so the
        // clamp is also the parity-correct value)
        val varX = greatest(dxx - pow(dx, 2) / col("n"), lit(0.0))
        val varY = greatest(dyy - pow(dy, 2) / col("n"), lit(0.0))
        val cov = dxy - dx * dy / col("n")
        Seq(col("l_returnflag"), col("n"),
          outDouble(when(col("n") > 1, sqrt(varX / (col("n") - 1)))
            .cast("decimal(18,6)")).as("stddev_qty"),
          outDouble(when(varX * varY > 0, cov / sqrt(varX * varY))
            .cast("decimal(18,6)")).as("corr_qty_price"))
      }: _*)
  }

  /** String-function coverage: case, substring, edit distance. */
  def partNameStrings(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("upper_name"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        length(col("p_name")).cast("long").as("name_len"),
        levenshtein(col("p_name"), lit("small widget")).cast("long").as("dist_to_small_widget"))

  /** Set operation: BUILDING-segment customers EXCEPT big-order
    * customers (distinct set semantics; one shuffle each side).
    */
  def buildingWithoutBigOrders(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("c_custkey"))
    building.except(big)
  }

  /** Exact median (linear-interpolated percentile) per group. */
  def medianOrderValue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(outDouble(median(col("o_totalprice")).cast("decimal(18,6)")).as("median_price"),
        count(lit(1)).as("n"))

  /** Distinct aggregation: exact distinct counts per market segment. */
  def distinctCustomersPerSegment(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment", "c_nationkey")
    cust.groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
  }
}
