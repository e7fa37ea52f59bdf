package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VecText

/** The exhaustive prefix-filter Jaccard operator (All-Pairs / PPJoin
  * prefix principle) and the threshold-gated verify kernel: equality
  * with a brute-force all-pairs replay, completeness under degenerate
  * canonical orders, kernel semantics, and the containment relation to
  * the length-windowed operator.
  */
class PrefixJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, Sf0001)

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc_id_a"), col("doc_id_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

  /** Brute-force all-pairs reference: every pair scored through the SAME
    * hashed-set merge-scan and decimal rounding as the operator's verify
    * stage — no candidate generation at all.
    */
  private def bruteForcePairs(t: Double): Set[(Long, Long, Double)] = {
    val hs = docs.select(col("doc_id"),
      VecText.hash_set64(Dedup.shingles(col("text"), 2)).as("hs"))
    val a = hs.select(col("doc_id").as("doc_id_a"), col("hs").as("hs_a"))
    val b = hs.select(col("doc_id").as("doc_id_b"), col("hs").as("hs_b"))
    pairSet(a.crossJoin(b).filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("jaccard",
        VecText.jaccard_sorted64(col("hs_a"), col("hs_b")).cast("decimal(18,6)"))
      .filter(col("jaccard") >= t)
      .select(col("doc_id_a"), col("doc_id_b"),
        col("jaccard").cast("double").as("jaccard")))
  }

  test("jaccard_prefix kernel: length, order, and heavy-hitter demotion") {
    val freq = Array(30L, 10L)
    java.util.Arrays.sort(freq)
    val df = Seq(
      (1L, Array(5L, 10L, 20L, 30L, 40L)), // s=5, t=0.6: L = 5-3+1 = 3
      (2L, Array(10L, 30L)),               // s=2, t=0.6: L = 2-2+1 = 1
      (3L, Array.empty[Long])
    ).toDF("id", "hs")
    val got = df.select(col("id"),
      VecText.jaccard_prefix(col("hs"), VecText.sorted_set_lit(freq), 0.6).as("p"))
      .as[(Long, Array[Long])].collect().toMap
    // rare elements (5, 20, 40) outrank heavy hitters (10, 30): the
    // 3-prefix is exactly the rares, in hash order
    assert(got(1L).toSeq == Seq(5L, 20L, 40L))
    // an all-frequent doc fills its prefix from the heavy hitters
    assert(got(2L).toSeq == Seq(10L))
    assert(got(3L).isEmpty)
  }

  test("jaccard_prefix: prefix length never under-counts across sizes and thresholds") {
    // L must be s - ceil(t*s) + 1 with EXACT rational ceil: an IEEE
    // overshoot would shorten the prefix and break completeness
    val rows = for (s <- 1 to 40) yield (s.toLong, (1L to s.toLong).toArray)
    val df = rows.toDF("s", "hs")
    for (t <- Seq(0.0, 0.3, 0.5, 0.6, 2.0 / 3.0, 0.7, 0.8, 1.0)) {
      val got = df.select(col("s"),
        size(VecText.jaccard_prefix(col("hs"), VecText.sorted_set_lit(Array.empty[Long]), t)).as("l"))
        .as[(Long, Int)].collect()
      got.foreach { case (s, l) =>
        // exact rational ceil of the double threshold's true value
        val ceilExact = (BigDecimal(t) * s)
          .setScale(0, BigDecimal.RoundingMode.CEILING).toInt
        val lMin = math.max(0, math.min(s.toInt, s.toInt - ceilExact + 1))
        // completeness: never shorter than the exact prefix; the 1e-9
        // epsilon may lengthen it by at most one element
        assert(l >= lMin && l <= math.min(s.toInt, lMin + 1),
          s"s=$s t=$t: got prefix $l, exact minimum $lMin")
      }
    }
  }

  test("jaccard_threshold_sorted64: survivors score bit-identically, losers are provably below") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      def set() = Array.fill(1 + rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      val a = set()
      // mix disjoint, overlapping, and identical pairs
      val b = i % 3 match {
        case 0 => set()
        case 1 => (a.take(a.length / 2 + 1) ++ set()).distinct.sorted
        case _ => a
      }
      (a, b)
    }
    val df = rows.toDF("a", "b")
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val got = df.select(
        VecText.jaccard_sorted64(col("a"), col("b")).as("full"),
        VecText.jaccard_threshold_sorted64(col("a"), col("b"), t).as("gated"))
        .as[(Double, Double)].collect()
      got.foreach { case (full, gated) =>
        if (gated >= 0) assert(gated == full, s"t=$t: survivor diverged")
        else assert(full < t - 1e-7, s"t=$t: early exit dropped J=$full")
      }
    }
  }

  test("jaccard_threshold_sorted64: two empty sets report below-threshold, never NaN") {
    // empty shingle sets share EVERY band bucket, so an empty pair is
    // reachable from any candidate stream; 0/0 = NaN would then blow up
    // the verify stage's ANSI decimal cast
    val df = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 2L), Array.empty[Long])).toDF("a", "b")
    // codegen path, through the same decimal cast the verify stage uses
    val got = df.select(
      VecText.jaccard_threshold_sorted64(col("a"), col("b"), 0.6).as("j"),
      VecText.jaccard_threshold_sorted64(col("a"), col("b"), 0.6)
        .cast("decimal(18,6)").as("d"))
      .as[(Double, java.math.BigDecimal)].collect()
    got.foreach { case (j, d) =>
      assert(j == -1.0, s"empty-side pair must be pruned, got $j")
      assert(d.doubleValue() == -1.0)
    }
    // interpreted path: the static kernel directly
    val empty = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)
    assert(graft.functions.VecTextKernels
      .jaccardThresholdSorted64(empty, empty, 0.6) == -1.0)
  }

  test("prefixJaccardPairs equals brute-force all-pairs at three thresholds") {
    for (t <- Seq(0.4, 0.6, 0.8)) {
      assert(pairSet(Dedup.prefixJaccardPairs(docs, t)) == bruteForcePairs(t),
        s"threshold $t: prefix-filter result diverged from brute force")
    }
  }

  test("completeness holds under degenerate canonical orders (empty and all-frequent heavy-hitter sets)") {
    val want = bruteForcePairs(0.6)
    // maxFreqSet=0: no heavy hitters, canonical order = plain hash order
    assert(pairSet(Dedup.prefixJaccardPairs(docs, 0.6, maxFreqSet = 0)) == want)
    // freqCut=1: EVERY element is a heavy hitter (up to the cap) —
    // completeness must not depend on which side of the order elements land
    assert(pairSet(Dedup.prefixJaccardPairs(docs, 0.6, freqCut = 1L)) == want)
  }

  test("the length-windowed operator is exactly the all-pairs result within the window") {
    val all = pairSet(Dedup.prefixJaccardPairs(docs, 0.6))
    val windowed = pairSet(Dedup.blockedJaccardPairs(docs, 0.6))
    assert(windowed.subsetOf(all))
    val chars = docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)].collect().toMap
    val sharesBucket = (p: (Long, Long, Double)) => {
      val (ca, cb) = (chars(p._1), chars(p._2))
      val (a1, a2) = (ca / 64, (ca + 32) / 64)
      val (b1, b2) = (cb / 64, (cb + 32) / 64)
      a1 == b1 || a1 == b2 || a2 == b1 || a2 == b2
    }
    assert(all.filter(sharesBucket) == windowed)
  }

  test("prefix filtering never enumerates blindly: candidates stay below the full cross product") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
    val n = docs.count()
    val prefixCand = Dedup.prefixJaccardCandidates(
      Dedup.hashedSets(sh), 0.6, 32L, 1 << 17).count()
    val verified = Dedup.prefixJaccardPairs(docs, 0.6).count()
    assert(prefixCand >= verified) // candidates are a superset of results
    assert(prefixCand < n * (n - 1) / 2)
  }
}
