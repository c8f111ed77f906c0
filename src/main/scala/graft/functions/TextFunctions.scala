package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-pipeline operators
  * (SURVEY.md §2 Dedup / Text analysis).
  *
  * Everything here is built from Spark SQL higher-order functions —
  * codegen'd, no UDFs, fully partial-aggregation friendly — and kept
  * ANSI-mode safe (Spark 4 default): arithmetic that could overflow
  * Long is done modulo a prime.
  */
object TextFunctions {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Let-binding: evaluate `c` exactly once and hand it to `f` as a
    * lambda variable. Without this, the optimizer inlines a computed
    * column into every expression that references it — a projection
    * `w = split(text)` referenced k times becomes k split() calls
    * *per row* after CollapseProject / filter pushdown (measured 100×
    * on the shingle pipeline). A lambda variable is bound once per
    * row, so `transform(array(c), x -> f(x))[1]` is a safe `let`. */
  def bind(c: Column, f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Space-joined word n-grams of a TOKEN ARRAY column; empty under n
    * tokens. For callers that already bound the tokens (computing
    * several n-gram orders from one tokenization). */
  def ngramsOfTokens(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (1 to n).map(o => element_at(w, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Space-joined word n-grams of `text`; empty for docs under n
    * tokens. Tokenization is bound once (see [[bind]]). */
  def wordNgrams(text: Column, n: Int): Column =
    bind(tokens(text), w => ngramsOfTokens(w, n))

  /** Distinct word 3-gram shingles of `text`. */
  def shingles3(text: Column): Column = array_distinct(wordNgrams(text, 3))

  /** 64-bit SimHash over the token multiset: per bit, sum +1/-1 by
    * the token hash's bit, take the sign. Pure map-side (no shuffle);
    * single native pass per doc ([[NativeExprs.SimHash64]]). */
  def simhash64(textCol: String): Column =
    call_function("graft_simhash64", tokens(col(textCol)))

  /** 128-wide MinHash signature of a string-set array
    * ([[NativeExprs.MinHashSignature]]): one native pass, no explode,
    * no shuffle. */
  def minhash128(shingleSet: Column): Column =
    call_function("graft_minhash128", shingleSet)

  /** Polynomial rolling fingerprint of the full text, mod 1e9+7
    * (ANSI-safe: intermediate stays well under Long.MaxValue). Native
    * single pass ([[NativeExprs.PolyFingerprint]]); the fold is
    * engine-portable, so a DuckDB oracle reproduces it exactly. */
  def polyFingerprint(textCol: String): Column =
    call_function("graft_polyfp", col(textCol))

  /** Minimum windowed substring hash (winnowing-style document
    * fingerprint): min over all 8-char windows of the polynomial
    * hash ([[NativeExprs.PolyMinWindow]] — engine-portable, unlike
    * xxhash64 whose seed is Spark-private). */
  def minWindowHash(textCol: String): Column =
    call_function("graft_minwindow8", col(textCol))

  /** Longest run of equal adjacent elements in a SORTED array — i.e.
    * the max multiplicity of any element. One aggregate() pass; used
    * by the repetition quality signals instead of a per-distinct-
    * element rescan. 0 for an empty array. */
  def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && x === acc("prev"),
          acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Exact Jaccard similarity of two (distinct-element) arrays, as a
    * double — integer set sizes divided in double, so the value is
    * bit-identical across engines ([[NativeExprs.JaccardSim]]). */
  def jaccard(a: Column, b: Column): Column =
    call_function("graft_jaccard", a, b)

  /** Dot product of two double arrays, sequential accumulation
    * ([[NativeExprs.DotProduct]] — same IEEE order as a scalar loop). */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with precomputable norms. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
