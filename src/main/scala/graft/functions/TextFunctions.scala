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

  /** Distinct word 3-gram shingles of the token-array column named
    * `w`; empty for docs under 3 tokens. */
  def shingles3(w: String): Column = expr(
    s"""CASE WHEN size($w) >= 3 THEN
       |  array_distinct(transform(sequence(0, size($w) - 3),
       |    i -> concat($w[i], ' ', $w[i+1], ' ', $w[i+2])))
       |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)

  /** 64-bit SimHash over the token multiset: per bit, sum +1/-1 by
    * the token hash's bit, take the sign. Pure map-side (no shuffle);
    * O(64·T) per doc inside whole-stage codegen. */
  def simhash64(tokensCol: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 63), i ->
       |    IF(aggregate(transform($tokensCol, t -> xxhash64(t)),
       |         CAST(0 AS BIGINT),
       |         (acc, h) -> acc + IF((shiftright(h, i) & 1) = 1, 1, -1)) >= 0,
       |       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
       |  CAST(0 AS BIGINT), (a, x) -> a | x)""".stripMargin)

  /** Polynomial rolling fingerprint of the full text, mod 1e9+7
    * (ANSI-safe: intermediate stays well under Long.MaxValue). */
  def polyFingerprint(textCol: String): Column = expr(
    s"""aggregate(split($textCol, ''), CAST(7 AS BIGINT),
       |  (h, c) -> pmod(h * 31 + ascii(c), 1000000007))""".stripMargin)

  /** Minimum windowed substring hash (winnowing-style document
    * fingerprint): min over all 8-char windows of xxhash64. */
  def minWindowHash(textCol: String): Column = expr(
    s"""IF(length($textCol) >= 8,
       |  array_min(transform(sequence(1, length($textCol) - 7),
       |    i -> xxhash64(substring($textCol, i, 8)))),
       |  xxhash64($textCol))""".stripMargin)

  /** Exact Jaccard similarity of two (distinct-element) arrays, as a
    * double — integer set sizes divided in double, so the value is
    * bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Dot product of two double arrays via a sequential fold (matches
    * a scalar loop's evaluation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with precomputable norms. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
