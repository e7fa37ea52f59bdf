package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the sketch/similarity hot kernels.
  *
  * Rationale (SURVEY.md §7.3): Spark's higher-order functions
  * (`transform`/`aggregate`/`zip_with`) evaluate their lambda through the
  * interpreted expression tree per element — a 64-permutation MinHash over
  * ~150 shingles costs ~10k lambda dispatches PER ROW. These expressions
  * run the same math as a single tight JVM loop per row (one virtual call
  * per row, not per element), a 20-50× kernel speedup, while staying
  * ordinary Catalyst expressions: null-safe, Tungsten-friendly,
  * usable in any projection.
  *
  * Numeric contract: all loops accumulate sequentially (element order),
  * matching both the HOF formulation they replace and DuckDB's
  * `list_sum`, so cross-engine float parity is preserved.
  */
object VecText {

  /** Mersenne prime 2^31-1: keeps `a*h + b` far from Long overflow under
    * ANSI arithmetic while preserving a full 31-bit hash range.
    */
  val P: Long = 2147483647L

  /** Deterministic permutation coefficients (fixed seed → identical
    * signatures on every executor and every run).
    */
  private[functions] def perms(numPerm: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(numPerm)(1L + rnd.nextInt((P - 1).toInt))
    val b = Array.fill(numPerm)(rnd.nextInt(P.toInt).toLong)
    (a, b)
  }

  /** MinHash signature of a string-array column: for each of `numPerm`
    * universal-hash permutations `(a_i * xxhash64(s) + b_i) mod P`, the
    * minimum over the array. Single pass over the array per row.
    */
  case class MinHashSignature(child: Expression, numPerm: Int)
      extends UnaryExpression with CodegenFallback {
    private lazy val (pa, pb) = perms(numPerm)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(numPerm)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        val hp = java.lang.Math.floorMod(h, P)
        var j = 0
        while (j < numPerm) {
          val v = (pa(j) * hp + pb(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of a string-array column: per-bit votes of each
    * element's xxhash64, sign-aggregated. Single pass per row.
    */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
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
      java.lang.Long.valueOf(sig)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct word k-shingles of a string-array column: all runs of k
    * consecutive elements joined by a single space, deduplicated; arrays
    * shorter than k collapse to one shingle of all elements (mirrors the
    * HOF formulation in Dedup.shingles and the DuckDB oracle's
    * list_distinct/list_transform equivalent). Single pass per row.
    */
  case class WordShingles(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      if (n < k) {
        val parts = Array.tabulate(n)(arr.getUTF8String)
        out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      } else {
        var i = 0
        while (i <= n - k) {
          val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
          var j = 0
          while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
          out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
          i += 1
        }
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Dot product of two float-array columns, accumulated in double in
    * element order (bit-identical to the zip_with/aggregate formulation
    * and to DuckDB's sequential list_sum).
    */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
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
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Exact Jaccard similarity of two string-array columns whose elements
    * are already distinct: |A∩B| / (|A|+|B|-|A∩B|), via one hash set.
    */
  case class JaccardDistinct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
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
      java.lang.Double.valueOf(inter.toDouble / (na + nb - inter).toDouble)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Sorted distinct xxhash64 image of a string array — the compact set
    * representation for mass pairwise Jaccard: computed once per document,
    * intersected by allocation-free merge-scan (JaccardSorted64). A 64-bit
    * collision (≈2⁻⁶⁴ per element pair) is the only way this diverges from
    * string-set Jaccard.
    */
  case class HashSet64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        hs(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        i += 1
      }
      java.util.Arrays.sort(hs)
      // drop duplicates in place (input may not be distinct)
      var w = 0
      i = 0
      while (i < n) {
        if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
        i += 1
      }
      new GenericArrayData(if (w == n) hs else java.util.Arrays.copyOf(hs, w))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Jaccard of two sorted distinct long arrays via merge-scan:
    * |A∩B| / (|A|+|B|-|A∩B|). No per-pair allocation.
    */
  case class JaccardSorted64(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
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
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // Column-API wrappers
  def word_shingles(c: Column, k: Int): Column = column(WordShingles(expr(c), k))
  def minhash_sig(c: Column, numPerm: Int): Column = column(MinHashSignature(expr(c), numPerm))
  def simhash64(c: Column): Column = column(SimHash64(expr(c)))
  def fvec_dot(a: Column, b: Column): Column = column(FloatVecDot(expr(a), expr(b)))
  def jaccard_distinct(a: Column, b: Column): Column = column(JaccardDistinct(expr(a), expr(b)))
  def hash_set64(c: Column): Column = column(HashSet64(expr(c)))
  def jaccard_sorted64(a: Column, b: Column): Column = column(JaccardSorted64(expr(a), expr(b)))

  private def expr(c: Column): Expression = expression(c)
}
