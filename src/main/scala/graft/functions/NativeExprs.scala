package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hashing/similarity hot loops.
  *
  * Spark's higher-order functions (`transform`, `aggregate`,
  * `array_intersect`) are `CodegenFallback`: every lambda application
  * is an interpreted expression-tree walk with per-element boxing. For
  * the dedup kernels that means ~40 µs per hash — the MinHash
  * signature stage alone (128 hashes × ~50 shingles × corpus) ran 37 s
  * at sf0.1. These expressions do the same math in a tight JVM loop
  * over the columnar `ArrayData` (no boxing, no per-element dispatch),
  * which brings the kernels to scan speed; at 100 TB they are the
  * difference between a CPU-bound cluster and an I/O-bound one.
  *
  * Registered under `graft_*` SQL names by [[graft.fgac.GraftExtensions]]
  * (`injectFunction`), so they work from SQL and from
  * `functions.call_function` alike.
  */
object NativeExprs {

  @inline private def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Sorted distinct xxhash64'd word-3-gram shingles of a text
    * column, in one native pass: lowercase → split(" ") → per-window
    * hash-chain of the three token hashes → dedup → sort. Replaces a
    * four-stage HOF pipeline (split/transform/array_distinct/
    * array_sort, each interpreted); downstream set ops use
    * [[JaccardSortedLong]] and [[MinHashFromHashes]] so shingle
    * *strings* are never materialized at all — at 100 TB the corpus
    * text is read once and only fixed-size longs ever leave the scan.
    * Token split matches `split(lower(text), ' ')` (empties kept). */
  case class ShingleHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hashes"

    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toLowerCase.toString
        .split(" ", -1)
      if (toks.length < 3) return new GenericArrayData(Array.emptyLongArray)
      val th = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) {
        val u = UTF8String.fromString(toks(i))
        th(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        i += 1
      }
      val out = new Array[Long](toks.length - 2)
      i = 0
      while (i < out.length) {
        out(i) = XXH64.hashLong(th(i + 2), XXH64.hashLong(th(i + 1), th(i)))
        i += 1
      }
      java.util.Arrays.sort(out)
      // dedup in place (sorted)
      var n = 0
      i = 0
      while (i < out.length) {
        if (n == 0 || out(i) != out(n - 1)) { out(n) = out(i); n += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, n))
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 128-wide MinHash signature over already-hashed shingles: element
    * k is min over the array of xxhash64(h, seed = k). Pairs with
    * [[ShingleHashes]]. */
  case class MinHashFromHashes(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_long"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          var k = 0
          while (k < numHashes) {
            val hk = XXH64.hashLong(h, k)
            if (hk < mins(k)) mins(k) = hk
            k += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 128-wide MinHash signature of a distinct-string array: element k
    * is min over the array of xxhash64(x, seed = k). One pass per
    * element, all mins updated in registers. */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val e = arr.getUTF8String(i)
          var k = 0
          while (k < numHashes) {
            val h = hashString(e, k)
            if (h < mins(k)) mins(k) = h
            k += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit SimHash of a token array: per bit, sum ±1 by the token
    * hash's bit, take the sign. Single pass, 64 counters. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = hashString(arr.getUTF8String(i), 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var sim = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) >= 0) sim |= (1L << j)
        j += 1
      }
      sim
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Exact Jaccard similarity of two string arrays treated as sets.
    * NaN when both are empty (matches `0/0` in double division, which
    * the HOF formulation produced). */
  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaccard"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val xs = new java.util.HashSet[UTF8String](math.max(8, x.numElements() * 2))
      var hasNullX = false
      var hasNullY = false
      var i = 0
      while (i < x.numElements()) {
        if (x.isNullAt(i)) hasNullX = true else xs.add(x.getUTF8String(i))
        i += 1
      }
      val ys = new java.util.HashSet[UTF8String](math.max(8, y.numElements() * 2))
      var inter = 0
      i = 0
      while (i < y.numElements()) {
        if (y.isNullAt(i)) hasNullY = true
        else {
          val e = y.getUTF8String(i)
          if (ys.add(e) && xs.contains(e)) inter += 1
        }
        i += 1
      }
      // NULL counts as a set member, as in array_intersect/array_union
      if (hasNullX && hasNullY) inter += 1
      val union = xs.size + (if (hasNullX) 1 else 0) +
        ys.size + (if (hasNullY) 1 else 0) - inter
      inter.toDouble / union.toDouble // 0/0 => NaN
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Jaccard similarity of two SORTED distinct long arrays via a
    * merge walk — no hashing, no allocation per pair. Used for the
    * O(block²) exact-Jaccard joins: shingles are hashed to 64-bit and
    * sorted once per document, so the per-pair cost drops to ~|A|+|B|
    * primitive compares. NaN when both are empty (0/0, as the HOF
    * formulation produced). */
  case class JaccardSortedLong(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaccard_sorted"
    // eval returns NULL for contract-violating (null-containing)
    // inputs even when the child expressions are non-nullable
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0
      var j = 0
      var inter = 0
      while (i < nx && j < ny) {
        // inputs violating the sorted-distinct-non-null contract get
        // NULL, not silently different math than graft_jaccard
        if (x.isNullAt(i) || y.isNullAt(j)) return null
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { inter += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      while (i < nx) { if (x.isNullAt(i)) return null; i += 1 }
      while (j < ny) { if (y.isNullAt(j)) return null; j += 1 }
      inter.toDouble / (nx + ny - inter).toDouble // 0/0 => NaN
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Dot product of two double arrays, sequential accumulation (same
    * IEEE evaluation order as the `aggregate(zip_with(...))` fold it
    * replaces, so results are bit-identical — including the NULL
    * result for length mismatches or NULL elements, which the fold
    * produced via zip_with padding). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"
    // eval returns NULL on length mismatch / null elements even when
    // the child expressions are non-nullable
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  private val FpPrime = 1000000007L
  private val FpSeed = 7L

  /** Polynomial rolling fingerprint of a string, mod 1e9+7: h = 7;
    * per code point, h = (h*31 + cp) mod p. Matches the DuckDB
    * `list_reduce(ascii)` fold exactly (code points == bytes for
    * ASCII corpora), so the result is oracle-comparable across
    * engines — unlike xxhash64, whose seed/implementation is
    * Spark-private. Replaces an interpreted `aggregate(split(...))`
    * HOF fold (~1 lambda dispatch per char). */
  case class PolyFingerprint(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_polyfp"

    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var h = FpSeed
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % FpPrime
        i += Character.charCount(cp)
      }
      h
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Winnowing-style minimum window fingerprint: min over all
    * `window`-code-point substrings of the [[PolyFingerprint]]
    * polynomial hash; texts shorter than the window hash whole.
    * O(window * n) primitive ops per row — native so the per-window
    * fold never hits the interpreted HOF path. Same cross-engine
    * contract as [[PolyFingerprint]]. */
  case class PolyMinWindow(child: Expression, window: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_minwindow"

    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val cps = s.codePoints().toArray
      val n = cps.length
      var best = Long.MaxValue
      var start = 0
      val lastStart = n - window
      if (lastStart < 0) {
        var h = FpSeed
        var i = 0
        while (i < n) { h = (h * 31 + cps(i)) % FpPrime; i += 1 }
        return h
      }
      while (start <= lastStart) {
        var h = FpSeed
        var i = start
        val end = start + window
        while (i < end) { h = (h * 31 + cps(i)) % FpPrime; i += 1 }
        if (h < best) best = h
        start += 1
      }
      best
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[NativeExprs.type].getName, null, name, usage, "")

  /** (identifier, info, builder) triples for
    * `SparkSessionExtensions.injectFunction`. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_minhash128"),
      info("graft_minhash128", "128-wide MinHash signature of a string array"),
      (args: Seq[Expression]) => MinHashSignature(args.head, 128)),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "exact Jaccard similarity of two string arrays"),
      (args: Seq[Expression]) => JaccardSim(args(0), args(1))),
    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "sorted distinct hashed word-3-gram shingles of a text column"),
      (args: Seq[Expression]) => ShingleHashes(args.head)),
    (FunctionIdentifier("graft_minhash128_long"),
      info("graft_minhash128_long",
        "128-wide MinHash signature over hashed shingles"),
      (args: Seq[Expression]) => MinHashFromHashes(args.head, 128)),
    (FunctionIdentifier("graft_jaccard_sorted"),
      info("graft_jaccard_sorted",
        "Jaccard similarity of two sorted distinct bigint arrays"),
      (args: Seq[Expression]) => JaccardSortedLong(args(0), args(1))),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_polyfp"),
      info("graft_polyfp",
        "polynomial rolling fingerprint of a string, mod 1e9+7"),
      (args: Seq[Expression]) => PolyFingerprint(args.head)),
    (FunctionIdentifier("graft_minwindow8"),
      info("graft_minwindow8",
        "min polynomial hash over all 8-char windows of a string"),
      (args: Seq[Expression]) => PolyMinWindow(args.head, 8)))
}
