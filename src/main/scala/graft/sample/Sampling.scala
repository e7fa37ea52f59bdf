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

  /** Key hash as a uniform fraction in [0,1): the first 32 bits of md5
    * over 2^32. A long/2^32 double division — one IEEE rounding, identical
    * in every engine.
    */
  def hashFraction(key: Column): Column =
    conv(substring(hashKey(key), 1, 8), 16, 10).cast("long") / lit(4294967296.0)

  /** Deterministic train/val/test split: every row gets a stable split
    * label from the md5 fraction of its salted key — reproducible across
    * engines/runs (the same contract as every sampler here), stable
    * under corpus growth (a document's split never changes when other
    * documents arrive — the property random split lacks), and salted so
    * independent experiments draw independent splits. Pure map-side.
    */
  def datasetSplit(df: DataFrame, key: Column, valFrac: Double = 0.05,
      testFrac: Double = 0.05, salt: String = "split1"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
      s"fractions must be nonnegative and sum below 1: $valFrac/$testFrac")
    val u = hashFraction(concat_ws("-", lit(salt), key.cast("string")))
    df.withColumn("split",
      when(u < testFrac, "test")
        .when(u < testFrac + valFrac, "val")
        .otherwise("train"))
  }

  /** Temperature-0.5 mixture rebalancing: downsample over-represented
    * groups (languages, sources) so group shares flatten from p_g toward
    * sqrt(p_g) — the standard multilingual-mixing temperature step.
    * Acceptance rate r_g = sqrt(n_min/n_g): the rarest group keeps
    * everything, a 100× larger group keeps 10%.
    *
    * The temperature is fixed at 0.5 on purpose: sqrt is IEEE-correctly
    * rounded, so rates — and therefore the exact selected subset — are
    * bit-reproducible across engines (pow(x, α-1) is not). Selection
    * hashes content (hashFraction), so reruns at any parallelism pick the
    * same rows.
    *
    * Scale shape: one tiny group-count aggregate (|groups| rows),
    * broadcast back; the filter itself is map-side. One shuffle total.
    */
  def mixtureSqrt(df: DataFrame, group: Column, key: Column): DataFrame = {
    val counts = df.groupBy(group.as("mix_g")).agg(count(lit(1)).as("n_g"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min("n_g").as("n_min"))))
      .select(col("mix_g"),
        sqrt(col("n_min").cast("double") / col("n_g").cast("double")).as("rate"))
    // null-safe join key: groupBy counts a NULL group as its own group,
    // so the rate row exists — but `===` would silently DROP every
    // null-group row instead of downsampling it
    df.join(broadcast(rates), group <=> col("mix_g"))
      .filter(hashFraction(key) < col("rate"))
      .drop("mix_g")
      .withColumn("sample_rate",
        col("rate").cast("decimal(18,6)").cast("double"))
      .drop("rate")
  }

  /** Deterministic epoch shuffle: the global random permutation every
    * training run needs before sharding/packing, as a pure function of
    * (key, epoch) — no RNG, no seed file. Each row gets a shard (first
    * 32 md5 bits of the epoch-salted key, mod `nShards`) and a dense
    * position 0..|shard|−1 (rank of the full hash within the shard).
    * Different epochs give independent permutations; the same epoch
    * replays bit-identically on any cluster size or engine.
    *
    * Scale shape: one shuffle on the shard key, then shard-parallel
    * rank windows — identical to [[packSequences]]'s per-shard plan (a
    * single global ORDER BY would serialize at 100 TB). Downstream,
    * (shard, pos) IS the training read order: write bucketed by shard,
    * sorted by pos, and epoch reads are sequential scans.
    */
  def epochShuffle(df: DataFrame, key: Column, epoch: Int, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_h"), key)
    df.withColumn("shuffle_h", md5(concat(key.cast("string"), lit(s":$epoch"))))
      .withColumn("shard",
        conv(substring(col("shuffle_h"), 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("shuffle_h")
  }

  /** Token-budget sequence packing: concatenate documents (in `order`
    * within each `shard`) into fixed-`budget` training sequences; each doc
    * gets the sequence index and intra-sequence offset where it starts.
    * Long docs straddle sequence boundaries (block packing, not best-fit —
    * deterministic and drift-free across reruns).
    *
    * Packing is per-shard BY DESIGN: a single global running sum is one
    * totally-ordered window — a serial bottleneck at 100 TB — while
    * per-shard packing is one shuffle on the shard key and each shard
    * packs independently.
    */
  def packSequences(
      df: DataFrame,
      shard: Column,
      order: Column,
      nTokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_idx", expr(s"cum_before div $budget"))
      .withColumn("seq_offset", col("cum_before") % budget)
  }

  /** Canonical registrable domain of a URL, in pure column ops: lowercase
    * + trim, scheme stripped (anchored, so replace-all == replace-first
    * in both engines), host taken up to the first `/`/`?`/`#`, trailing
    * `:port` dropped, leading `www.` dropped. Every regex is RE2/Java
    * portable — the canonicalization replays exactly in DuckDB.
    */
  def canonicalDomain(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_extract(
          regexp_replace(lower(trim(url)), "^[a-z][a-z0-9+.-]*://", ""),
          "^([^/?#]*)", 1),
        ":[0-9]+$", ""),
      "^www\\.", "")

  /** Per-domain source cap — the standard web-corpus gate next to the
    * gopher-style quality filters: no single site may contribute more
    * than `n` documents. Selection WITHIN a domain is md5-rank (the
    * deterministic "random" order every sampler here uses), so the kept
    * subset is a pure function of the data — reproducible across runs,
    * partitionings, and engines.
    *
    * Scale shape: one shuffle on the canonical domain; the window is
    * `row_number <= n`, which Spark's InferWindowGroupLimit prunes to
    * ~n rows per domain MAP-SIDE before the exchange — so the shuffle
    * moves O(domains × n) rows, not the corpus (the same plan shape as
    * [[stratifiedTopN]]; guarded by DomainCapSpec). Skew note: a
    * mega-domain's map-side groups are pruned to n per input partition
    * before any data moves, so even a domain holding half the corpus
    * contributes ≤ n × partitions shuffled rows, never its full mass.
    */
  def domainCap(df: DataFrame, url: Column, key: Column, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = Window.partitionBy(col("domain")).orderBy(hashKey(key), key)
    df.withColumn("domain", canonicalDomain(url))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }
}
