package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernels shared by the interpreted (`nullSafeEval`) and
  * code-generated (`doGenCode`) paths of the VecText expressions. Plain
  * top-level object → Scala emits static forwarders, so Janino-generated
  * code can call e.g. `graft.functions.VecTextKernels.hashSet64(arr)`
  * directly.
  */
object VecTextKernels {


  /** 64-bit block-hash perceptual signature as two 32-bit words
    * [w0, w1] (graft.multimodal.Multimodal.phashWords is the operator
    * doc): 64 proportional SQL-substring char blocks; one bit per block
    * = parity of the last md5 hex digit of the block (= digest byte 15
    * & 1 — `conv(substring(md5(b),32,1),16,10) % 2` in the HOF anchor
    * and the DuckDB oracle); MSB-first packing per word. Block bounds
    * use exact long floor division — the same values as the HOF's
    * double division by 64 (power of two, products < 2^53).
    */
  def phashWords(s: UTF8String): ArrayData = {
    val md = md5Local.get()
    val L = s.numChars()
    var w0 = 0L
    var w1 = 0L
    var i = 0
    while (i < 64) {
      val st = (i.toLong * L / 64).toInt
      val en = ((i + 1).toLong * L / 64).toInt
      md.reset()
      val d = md.digest(s.substringSQL(st + 1, en - st).getBytes)
      val bit = (d(15) & 1).toLong
      if (i < 32) w0 = w0 * 2 + bit else w1 = w1 * 2 + bit
      i += 1
    }
    new GenericArrayData(Array(w0, w1))
  }


  /** One-pass document-length + per-term frequencies over the corpus
    * tokenizer's semantics (tokens = maximal runs of non-space bytes —
    * exactly `filter(split(text, " +"), len > 0)`; the corpus alphabet
    * is single-byte, space-delimited). Returns [dl, tf0, tf1, ...].
    * The HOF formulation (4 interpreted split+filter chains per row)
    * cost 2.9 s at sf0.1; this is one tight byte scan.
    */
  def termFreqs(s: UTF8String, terms: ArrayData): ArrayData = {
    val bytes = s.getBytes
    val nT = terms.numElements()
    val termBytes = Array.tabulate(nT)(i => terms.getUTF8String(i).getBytes)
    val out = new Array[Long](nT + 1)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && bytes(i) != ' ') i += 1
        out(0) += 1
        var t = 0
        while (t < nT) {
          val tb = termBytes(t)
          if (tb.length == i - start) {
            var j = 0
            var eq = true
            while (eq && j < tb.length) {
              if (tb(j) != bytes(start + j)) eq = false
              j += 1
            }
            if (eq) out(t + 1) += 1
          }
          t += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  /** Mersenne prime 2^61-1: the modulus for MinHash universal hashing.
    * Chosen so every stage is reproducible OUTSIDE the JVM: any engine
    * with md5 and 128-bit integer arithmetic (e.g. DuckDB's HUGEINT)
    * computes identical signatures — `(a*h + b) % P` needs only the
    * product to fit in 128 bits.
    */
  val P: Long = 2305843009213693951L

  /** First 60 bits of md5(bytes) — i.e. the first 15 hex chars of the
    * canonical md5 digest parsed as an integer. Engine-independent base
    * hash: DuckDB spells it `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5Mod60(s: UTF8String): Long = md5U64(s) >>> 4 // first 15 hex chars

  /** First 8 md5 digest bytes, big-endian, as the unsigned bit pattern in
    * a long — DuckDB reconstructs it from two 8-hex-char halves.
    */
  def md5U64(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v
  }

  def md5Mod60Str(s: String): Long =
    md5Mod60(UTF8String.fromString(s))

  /** All 16 md5 digest bytes as two unsigned-bit-pattern longs
    * `[hex 1-16, hex 17-32]` — the 128-bit extension of [[md5U64]]
    * (word 0 IS md5U64's value). DuckDB rebuilds each word from two
    * 8-hex-char halves exactly like the 64-bit recipe.
    */
  def md5U128(s: UTF8String): Array[Long] = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val w = new Array[Long](2)
    var k = 0
    while (k < 2) {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(k * 8 + i) & 0xFFL); i += 1 }
      w(k) = v
      k += 1
    }
    w
  }

  /** `(a*h + b) mod 2^61-1` without 128-bit types: multiplyHigh gives the
    * upper 64 product bits; two Mersenne folds reduce the 122-bit value.
    * Exactly equals the BigInt formulation (property-pinned in VecTextSpec).
    */
  def mulAddMod61(a: Long, h: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, h)
    val lo = a * h
    val low = lo & P                          // bits 0..60
    val mid = (lo >>> 61) | (hi << 3)         // bits 61..124 (hi < 2^58)
    var r = low + (mid & P) + (mid >>> 61)    // < 3·2^61, no overflow
    r = (r & P) + (r >>> 61)
    if (r >= P) r -= P
    var s = r + b                             // < 2^62, no overflow
    if (s >= P) s -= P
    s
  }

  /** Deterministic permutation coefficients, md5-derived (not PRNG-drawn)
    * so an external oracle can regenerate them from the same recipe:
    * `a_i = 1 + md5_60("minhash-a-i") mod (P-1)`,
    * `b_i =     md5_60("minhash-b-i") mod P`. Cached per numPerm.
    */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private[functions] def perms(numPerm: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numPerm, { n =>
      val a = Array.tabulate(n)(i => 1L + md5Mod60Str(s"minhash-a-$i") % (P - 1))
      val b = Array.tabulate(n)(i => md5Mod60Str(s"minhash-b-$i") % P)
      (a, b)
    })

  def wordShingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val sep = UTF8String.fromString(" ")
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n < k) {
      val parts = Array.tabulate(n)(arr.getUTF8String)
      out.add(UTF8String.concatWs(sep, parts: _*))
    } else {
      var i = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def minhash(arr: ArrayData, numPerm: Int): ArrayData = {
    val (pa, pb) = perms(numPerm)
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = md5Mod60(arr.getUTF8String(i)) // one md5 per shingle; the
      var j = 0                              // numPerm mixes are mulAddMod61
      while (j < numPerm) {
        val v = mulAddMod61(pa(j), h, pb(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = md5U64(arr.getUTF8String(i)) // engine-reproducible bit source
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 128-bit SimHash over the full md5 of each element, as two 64-bit
    * signature words `[w0, w1]` with `w0` voting on md5 hex 1-16 (so
    * `w0` equals the 64-bit [[simhash]] value) and `w1` on hex 17-32.
    * Twice the signature entropy halves nothing per bit — but it lets
    * candidate bands be 32 bits wide instead of 16 at the same
    * pigeonhole guarantee, dividing random band-collision density by
    * 2^16 (the web-scale cliff of the 64-bit variant).
    */
  def simhashWide(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val votes = new Array[Int](128)
    var i = 0
    while (i < n) {
      val w = md5U128(arr.getUTF8String(i))
      var k = 0
      while (k < 2) {
        val h = w(k)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(k * 64 + b) += 1
          else votes(k * 64 + b) -= 1
          b += 1
        }
        k += 1
      }
      i += 1
    }
    val sig = new Array[Long](2)
    var b = 0
    while (b < 128) {
      if (votes(b) > 0) sig(b / 64) |= (1L << (b % 64))
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Nearest-centroid id by cosine over a (centroid_id, centroid) struct
    * array — the map-side argmax of distributed k-means assignment (one
    * tight loop per row, no row explosion, no shuffle). Arithmetic is
    * bit-identical to the Column-level `cosine()` (sequential-order
    * double accumulation of dot and both norms, float elements widened
    * per element); ties keep the FIRST strict maximum, so with the
    * struct array sorted by centroid_id this equals the oracle window's
    * `ORDER BY d DESC, centroid_id`. Zero-norm (NULL-cosine) centroids
    * are skipped; if every cosine is NULL the first (lowest) centroid id
    * is returned — NULLs sort last under DESC on both engines.
    */
  def nearestCentroid(cents: ArrayData, emb: ArrayData): Long = {
    val n = emb.numElements()
    var na = 0.0
    var j = 0
    while (j < n) {
      val v = emb.getFloat(j).toDouble
      na += v * v
      j += 1
    }
    na = math.sqrt(na)
    val k = cents.numElements()
    var bestCid = if (k > 0) cents.getStruct(0, 2).getLong(0) else -1L
    var bestD = 0.0
    var hasBest = false
    var i = 0
    while (i < k) {
      val row = cents.getStruct(i, 2)
      val cent = row.getArray(1)
      var dot = 0.0
      var nb = 0.0
      var m = 0
      while (m < n) {
        val x = emb.getFloat(m).toDouble
        val y = cent.getDouble(m)
        dot += x * y
        nb += y * y
        m += 1
      }
      nb = math.sqrt(nb)
      if (na * nb > 0) {
        val d = dot / (na * nb)
        if (!hasBest || d > bestD) {
          hasBest = true
          bestD = d
          bestCid = row.getLong(0)
        }
      }
      i += 1
    }
    bestCid
  }

  /** Hashed-linear classifier weight sum over a token array — the
    * fasttext-style quality-model shape (score = w·φ(x) over hashed
    * unigram features) with deterministic md5-derived stand-in weights:
    * weight(t) = (first-8-md5-hex(t) as u32) mod 2001 − 1000, i.e. an
    * integer in [−1000, 1000] ("w × 1000"). Summing exact longs (not
    * doubles) makes the result independent of token order and engine —
    * DuckDB replays it as
    * `list_sum(list_transform(toks, t -> CAST('0x'||substr(md5(t),1,8) AS BIGINT) % 2001 - 1000))`.
    * A trained model would broadcast its real weight table instead; the
    * plumbing (single pass, map-side, no shuffle) is the same.
    */
  def hashWeightSum(arr: ArrayData): Long = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += (md5U64(arr.getUTF8String(i)) >>> 32) % 2001L - 1000L
      i += 1
    }
    sum
  }

  /** Single-pass repetition statistics over a token array (Gopher-style
    * repetition filters need the most-repeated unigram/bigram mass):
    * returns (n_tokens, max unigram count, n_bigrams, max bigram count).
    * Bigrams are counted WITH multiplicity — wordShingles' distinct set
    * is the wrong input for repetition measurement.
    */
  def repetitionStats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val uni = new java.util.HashMap[UTF8String, Int]()
    var maxUni = 0L
    var i = 0
    while (i < n) {
      val c = uni.merge(arr.getUTF8String(i), 1, (x, y) => x + y)
      if (c > maxUni) maxUni = c
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val bi = new java.util.HashMap[UTF8String, Int]()
    var maxBi = 0L
    i = 0
    while (i < n - 1) {
      val g = UTF8String.concatWs(sep, arr.getUTF8String(i), arr.getUTF8String(i + 1))
      val c = bi.merge(g, 1, (x, y) => x + y)
      if (c > maxBi) maxBi = c
      i += 1
    }
    val out = Array(n.toLong, maxUni, math.max(0, n - 1).toLong, maxBi)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Static token sets for the single-pass text-stats kernel — must stay
    * in lockstep with TextAnalysis.stopwords / langMarkers (asserted by
    * VecTextSpec parity tests).
    */
  private def utf8Set(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  private val stopSet = utf8Set(Seq("the", "a", "of", "and", "to", "in", "is", "it"))
  private val langSets: Array[java.util.HashSet[UTF8String]] = Array(
    utf8Set(Seq("der", "und", "nicht", "das")), // de
    utf8Set(Seq("the", "and", "not", "this")),  // en
    utf8Set(Seq("el", "los", "que", "este")),   // es
    utf8Set(Seq("le", "les", "que", "ce")),     // fr
    utf8Set(Seq("de", "shi", "bu", "zhe")))     // zh

  /** One pass over the token array: token count, stopword hits, distinct
    * count, and the five language marker scores. Returns a 8-long array
    * (n_tokens, n_stop, n_distinct, s_de, s_en, s_es, s_fr, s_zh).
    */
  def textStats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var nStop = 0L
    val distinct = new java.util.HashSet[UTF8String]()
    val langs = new Array[Long](5)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (stopSet.contains(t)) nStop += 1
      distinct.add(t)
      var l = 0
      while (l < 5) {
        if (langSets(l).contains(t)) langs(l) += 1
        l += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      Array(n.toLong, nStop, distinct.size.toLong,
        langs(0), langs(1), langs(2), langs(3), langs(4)))
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** Deterministic pseudo-random hyperplanes for (bits, dims): component
    * (p, d) = (xxhash64(p, d) mod 1e6)/1e6 - 0.5, identical to the HOF
    * formulation it replaces (seed 42, int-typed inputs).
    */
  private[functions] def rhpPlanes(bits: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, dims), { case (b, d) =>
      // md5-derived (not xxhash): an external engine can regenerate the
      // exact planes from the "rhp-<plane>-<dim>" recipe (see the
      // sim_lsh_ann oracle), like the MinHash permutation constants
      Array.tabulate(b, d) { (p, i) =>
        (md5Mod60Str(s"rhp-$p-$i") % 1000000L).toDouble / 1000000.0 - 0.5
      }
    })

  /** b-bit random-hyperplane signature of a float vector. */
  def rhpSig(arr: ArrayData, bits: Int): Long = {
    val dims = arr.numElements()
    val planes = rhpPlanes(bits, dims)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      while (i < dims) {
        acc += arr.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def jaccardDistinct(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[Any](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) {
      if (set.contains(b.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  def hashSet64(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    // primitive-backed (UnsafeArrayData): getLong stays unboxed downstream
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (w == n) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Prefix-filter selection for threshold-Jaccard self-joins (the
    * All-Pairs / PPJoin prefix principle, Bayardo et al. WWW'07; Xiao et
    * al. WWW'08): given a document's sorted distinct hash set `hs` (a
    * [[hashSet64]] image) and the corpus' sorted heavy-hitter set `freq`,
    * return the first L = |hs| − ⌈t·|hs|⌉ + 1 elements of `hs` under the
    * canonical total order (rare-by-hash, then frequent-by-hash). Any
    * pair with Jaccard ≥ t shares at least one element of both prefixes
    * under ANY global total order — this order keeps heavy hitters out
    * of prefixes, so the downstream equi-join on prefix elements emits
    * ≤ df(e)² < freqCut·df(e) candidates per rare element: candidate
    * volume is bounded by freqCut × total shingle count (linear), not
    * per-block occupancy² (quadratic).
    *
    * The required overlap is computed at t′ = t − 1e-6, the SAME margin
    * as [[jaccardThresholdSorted64]] and the downstream prunes: the
    * verify stage's decimal(18,6) rounding admits pairs with true
    * J ∈ [t − 5e-7, t), so every stage that can discard a pair must use
    * the relaxed threshold or the pipeline's exhaustiveness contract
    * breaks for mega-element sets (J granularity ~1/|union| only
    * protects below ~10⁵ elements). ⌈t′·s⌉ additionally subtracts 1e-9
    * against float overshoot: both epsilons only ever LENGTHEN the
    * prefix (more candidates, still exact).
    */
  def jaccardPrefix(hs: ArrayData, freq: ArrayData, threshold: Double): ArrayData = {
    val s = hs.numElements()
    if (s == 0) return EmptyLongArray
    val t = if (threshold > 1e-6) threshold - 1e-6 else 0.0
    val o = math.ceil(t * s - 1e-9).toInt
    val L0 = s - o + 1
    val L = if (L0 < 0) 0 else if (L0 > s) s else L0
    if (L == 0) return EmptyLongArray
    val out = new Array[Long](L)
    // single membership pass: rares stream straight into the output,
    // heavy hitters buffer and fill whatever tail the rares leave
    val hot = new Array[Long](L)
    var w = 0
    var nHot = 0
    var i = 0
    while (i < s && w < L) {
      val h = hs.getLong(i)
      if (containsSorted64(freq, h)) {
        if (nHot < L) { hot(nHot) = h; nHot += 1 }
      } else { out(w) = h; w += 1 }
      i += 1
    }
    var j = 0
    while (w < L && j < nHot) { out(w) = hot(j); w += 1; j += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (w == L) out else java.util.Arrays.copyOf(out, w))
  }

  /** Shared empty result for the per-row kernels (no per-row garbage). */
  private val EmptyLongArray =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)

  /** Threshold-gated Jaccard of two sorted distinct long arrays: returns
    * the exact Jaccard when it can reach `threshold` (after the oracle's
    * 6-dp decimal rounding — the required-overlap bound is computed at
    * threshold − 1e-6 so a round-up survivor is never dropped), and −1.0
    * with an EARLY EXIT as soon as the remaining elements cannot reach
    * the required overlap o ≥ t'/(1+t')·(|a|+|b|). For a hopeless pair
    * the merge aborts after ~(1 − 2t'/(1+t'))·(|a|+|b|) steps — at
    * t = 0.6, ~25% of the full scan — and candidate streams are
    * overwhelmingly hopeless pairs (338M candidates → 2.5k survivors at
    * the ×10 rehearsal), so this is a ~4× cut of the verify stage's
    * dominant loop with bit-identical surviving scores.
    */
  def jaccardThresholdSorted64(a: ArrayData, b: ArrayData, threshold: Double): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // two empty sets would otherwise fall through to 0/0 = NaN, and the
    // verify stage's decimal cast under ANSI mode throws on NaN — for any
    // threshold > 0 an empty pair can never qualify, so report
    // below-threshold (empty docs DO meet in every band bucket, making
    // this pair reachable from the candidate stream)
    if (na == 0 && nb == 0) return -1.0
    val t = if (threshold > 1e-6) threshold - 1e-6 else 0.0
    val o = math.ceil(t / (1.0 + t) * (na + nb) - 1e-9)
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val rem = math.min(na - i, nb - j)
      if (inter + rem < o) return -1.0
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (inter < o) -1.0
    else inter.toDouble / (na + nb - inter).toDouble
  }

  /** Binary search over a sorted (signed asc) long ArrayData. */
  def containsSorted64(a: ArrayData, key: Long): Boolean = {
    var lo = 0
    var hi = a.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = a.getLong(mid)
      if (v == key) return true
      if (v < key) lo = mid + 1 else hi = mid - 1
    }
    false
  }
}

/** Custom Catalyst expressions for the sketch/similarity hot kernels.
  *
  * Rationale (SURVEY.md §7.3): Spark's higher-order functions
  * (`transform`/`aggregate`/`zip_with`) evaluate their lambda through the
  * interpreted expression tree per element — a 64-permutation MinHash over
  * ~150 shingles costs ~10k lambda dispatches PER ROW. These expressions
  * run the same math as a single tight JVM loop per row.
  *
  * All of them implement `doGenCode` (inline loops for the pairwise
  * kernels, a static VecTextKernels call for the sketch builders): a
  * CodegenFallback expression would force the WHOLE projection stage into
  * interpreted mode, which costs more than the kernel itself on
  * million-row candidate streams.
  *
  * Numeric contract: all loops accumulate sequentially (element order),
  * matching both the HOF formulation they replace and DuckDB's
  * `list_sum`, so cross-engine float parity is preserved.
  */
object VecText {

  val P: Long = VecTextKernels.P
  private[functions] def perms(numPerm: Int) = VecTextKernels.perms(numPerm)

  /** Distinct word k-shingles of a string-array column (runs of k
    * consecutive elements joined by a space; shorter arrays collapse to
    * one shingle of all elements — mirrors the HOF formulation and the
    * DuckDB oracle).
    */
  case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.wordShingles(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.wordShingles($c, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature: numPerm universal-hash permutations
    * `(a_i * md5_60(s) + b_i) mod 2^61-1` minimized over the array —
    * engine-reproducible end to end (see VecTextKernels.md5Mod60).
    */
  case class MinHashSignature(child: Expression, numPerm: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.minhash(input.asInstanceOf[ArrayData], numPerm)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.minhash($c, $numPerm)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash: per-bit votes of each element's md5-derived 64-bit
    * hash (engine-reproducible; see VecTextKernels.md5U64).
    */

  /** [dl, tf0, tf1, ...] in one pass (VecTextKernels.termFreqs). */
  case class TermFreqs(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(text: Any, terms: Any): Any =
      VecTextKernels.termFreqs(text.asInstanceOf[UTF8String], terms.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, q) => s"graft.functions.VecTextKernels.termFreqs($t, $q)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Perceptual block-hash signature [w0, w1] of a payload string (see
    * VecTextKernels.phashWords for the bit recipe and oracle parity).
    */
  case class PhashWords(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.phashWords(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.phashWords($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }


  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.simhash(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.simhash($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 128-bit SimHash as two 64-bit words [w0, w1]; w0 equals the 64-bit
    * [[SimHash64]] value (see VecTextKernels.simhashWide).
    */
  case class SimHashWide(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.simhashWide(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.simhashWide($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Nearest-centroid id over a broadcast (centroid_id, centroid) struct
    * array (see VecTextKernels.nearestCentroid for the parity contract).
    */
  case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(cents: Any, emb: Any): Any =
      java.lang.Long.valueOf(VecTextKernels.nearestCentroid(
        cents.asInstanceOf[ArrayData], emb.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (c, e) => s"graft.functions.VecTextKernels.nearestCentroid($c, $e)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Sorted distinct xxhash64 image of a string array — the compact set
    * representation for mass pairwise Jaccard (intersect via
    * JaccardSorted64's merge-scan). A 64-bit collision (≈2⁻⁶⁴ per element
    * pair) is the only divergence from string-set Jaccard.
    */
  case class HashSet64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.hashSet64(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.hashSet64($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Single-pass token statistics: (n_tokens, n_stop, n_distinct,
    * s_de..s_zh) as a long array — replaces five-plus interpreted HOF
    * traversals in the text-quality/langid path. Marker/stopword sets
    * are pinned to TextAnalysis's by parity tests.
    */
  case class TextStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.textStats(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.textStats($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Single-pass repetition statistics: (n_tokens, max unigram count,
    * n_bigrams, max bigram count) — see VecTextKernels.repetitionStats.
    */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.repetitionStats(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.repetitionStats($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Hashed-linear classifier weight sum (×1000, exact long) — see
    * VecTextKernels.hashWeightSum for the weight recipe and oracle form.
    */
  case class HashWeightSum(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(VecTextKernels.hashWeightSum(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.hashWeightSum($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** b-bit random-hyperplane LSH signature (Charikar'02) of a float
    * vector; deterministic hash-derived planes, single pass per row.
    */
  case class RhpSignature(child: Expression, bits: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      VecTextKernels.rhpSig(input.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.VecTextKernels.rhpSig($c, $bits)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Dot product of two float-array columns, accumulated in double in
    * element order (bit-identical to the zip_with/aggregate formulation
    * and DuckDB's sequential list_sum). Codegen: inline loop.
    */
  case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Jaccard of two sorted distinct long arrays via merge-scan:
    * |A∩B| / (|A|+|B|-|A∩B|). Codegen: inline loop, no per-pair
    * allocation — runs on multi-million-row candidate streams.
    */
  case class JaccardSorted64(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0
      var j = 0
      var inter = 0
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      java.lang.Double.valueOf(inter.toDouble / (na + nb - inter).toDouble)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val inter = ctx.freshName("inter")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $i = 0; int $j = 0; int $inter = 0;
           |while ($i < $na && $j < $nb) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($j);
           |  if ($x == $y) { $inter++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |${ev.value} = ((double) $inter) / (double) ($na + $nb - $inter);
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Exact Jaccard of two distinct string arrays via one hash set —
    * reference formulation for tests; prefer HashSet64+JaccardSorted64
    * for mass pairwise use.
    */
  case class JaccardDistinct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(VecTextKernels.jaccardDistinct(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecTextKernels.jaccardDistinct($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** [[VecTextKernels.jaccardPrefix]]: the prefix-filter slice of a
    * sorted hash set under the (rare, frequent) canonical order.
    * `threshold` is a plan constant (like WordShingles' k) — the
    * generated source embeds the value, the heavy-hitter set rides as an
    * ordinary literal reference, so codegen stays plan-stable.
    */
  case class JaccardPrefix(left: Expression, right: Expression, threshold: Double)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(l: Any, r: Any): Any =
      VecTextKernels.jaccardPrefix(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], threshold)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VecTextKernels.jaccardPrefix($a, $b, $threshold)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** [[VecTextKernels.jaccardThresholdSorted64]]: exact Jaccard with a
    * required-overlap early exit — −1.0 marks a pair that provably
    * cannot round up to `threshold`. Surviving scores are bit-identical
    * to [[JaccardSorted64]].
    */
  case class JaccardThresholdSorted64(left: Expression, right: Expression, threshold: Double)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(VecTextKernels.jaccardThresholdSorted64(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], threshold))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VecTextKernels.jaccardThresholdSorted64($a, $b, $threshold)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // Column-API wrappers
  def word_shingles(c: Column, k: Int): Column = column(WordShingles(expr(c), k))
  def rhp_signature(c: Column, bits: Int): Column = column(RhpSignature(expr(c), bits))
  def text_stats(c: Column): Column = column(TextStats(expr(c)))
  def repetition_stats(c: Column): Column = column(RepetitionStats(expr(c)))
  def minhash_sig(c: Column, numPerm: Int): Column = column(MinHashSignature(expr(c), numPerm))
  def simhash64(c: Column): Column = column(SimHash64(expr(c)))
  def phash_words(c: Column): Column = column(PhashWords(expr(c)))
  def term_freqs(text: Column, terms: Column): Column =
    column(TermFreqs(expr(text), expr(terms)))
  def simhash_wide(c: Column): Column = column(SimHashWide(expr(c)))
  def fvec_dot(a: Column, b: Column): Column = column(FloatVecDot(expr(a), expr(b)))
  def nearest_centroid(cents: Column, emb: Column): Column =
    column(NearestCentroid(expr(cents), expr(emb)))
  def hash_weight_sum(c: Column): Column = column(HashWeightSum(expr(c)))
  def jaccard_distinct(a: Column, b: Column): Column = column(JaccardDistinct(expr(a), expr(b)))
  def hash_set64(c: Column): Column = column(HashSet64(expr(c)))
  def jaccard_sorted64(a: Column, b: Column): Column = column(JaccardSorted64(expr(a), expr(b)))
  def jaccard_prefix(hs: Column, freq: Column, threshold: Double): Column =
    column(JaccardPrefix(expr(hs), expr(freq), threshold))
  def jaccard_threshold_sorted64(a: Column, b: Column, threshold: Double): Column =
    column(JaccardThresholdSorted64(expr(a), expr(b), threshold))

  /** A sorted long array as a primitive-backed literal Column — the
    * broadcast-by-plan-reference form for small driver-built sets
    * (heavy-hitter lists): codegen reads it from the references array,
    * so the generated source stays stable across different sets.
    */
  def sorted_set_lit(arr: Array[Long]): Column =
    column(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(arr),
      ArrayType(LongType, containsNull = false)))

  private def expr(c: Column): Expression = expression(c)
}
