package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions.{col, count, lit, pmod, row_number, sum, when}

/** Salted two-level bounded rank — the relational "top k per group"
  * that never sorts a full group in one task: stage 1 ranks within
  * (group, salt) — `fanout` parallel bounded sorts whose outputs are
  * ≤ k rows each (every true global top-k row survives its salt
  * group, since dropping it there would need k better rows in the
  * SAME salt) — and stage 2 ranks the ≤ fanout·k survivors per
  * group, input bounded by CONSTRUCTION, never by group size. All
  * codegen'd window ops: no object aggregation, no typed-encoder
  * serialization on the hot path. Used by the PQ rerank cut and the
  * LSH bucket-representative election. */
object SaltedRank {
  /** First name in `base`, `base0`, `base1`, … not already a column of
    * the input — a caller whose DataFrame happens to carry `_salt` or
    * `_r1` must not have it clobbered and silently dropped. */
  private def fresh(base: String, avoid: Set[String]): String = {
    var n = base
    var i = 0
    while (avoid(n)) { n = s"$base$i"; i += 1 }
    n
  }

  def topKPerGroup(df: DataFrame, group: Seq[Column],
      order: Seq[Column], k: Int, saltOn: Column, fanout: Int): DataFrame = {
    val (out, rank) = topKPerGroupRanked(df, group, order, k, saltOn, fanout)
    out.drop(rank)
  }

  /** Like [[topKPerGroup]] but keeps the final within-group rank
    * (1-based, dense by construction of row_number) and returns its
    * column name — for callers whose OUTPUT is the ranking itself
    * (per-source quality caps), so they need no third window. */
  def topKPerGroupRanked(df: DataFrame, group: Seq[Column],
      order: Seq[Column], k: Int, saltOn: Column,
      fanout: Int): (DataFrame, String) = {
    val taken = df.columns.toSet
    val saltC = fresh("_salt", taken)
    val r1 = fresh("_r1", taken)
    val r2 = fresh("_r2", taken)
    val w1 = Window.partitionBy(group :+ col(saltC): _*).orderBy(order: _*)
    val w2 = Window.partitionBy(group: _*).orderBy(order: _*)
    val out = df.withColumn(saltC, pmod(saltOn, lit(fanout)))
      .withColumn(r1, row_number().over(w1))
      .filter(col(r1) <= k)
      .withColumn(r2, row_number().over(w2))
      .filter(col(r2) <= k)
      .drop(saltC, r1)
    (out, r2)
  }

  /** Like [[topKPerGroupRanked]] but each surviving row additionally
    * carries its group's TOTAL input row count, derived INSIDE the
    * election's own two window jobs — so a caller that needs
    * cap-overflow detection (did any group hold more than k rows?)
    * pays no separate aggregate over the full input:
    *   - stage 1 counts rows per (group, salt) in the same
    *     partitioning its rank sorts by (one Exchange, one Sort;
    *     the unordered count rides the sorted distribution);
    *   - stage 2 sums those per-salt counts over each salt's rank-1
    *     survivor — every nonempty salt group keeps exactly one
    *     rank-1 row through the stage-1 filter, so the sum is the
    *     exact group total even for groups whose rows were capped.
    * Returns (survivors, finalRankCol, groupTotalCol); the total is
    * a LongType column. */
  def topKPerGroupSized(df: DataFrame, group: Seq[Column],
      order: Seq[Column], k: Int, saltOn: Column,
      fanout: Int): (DataFrame, String, String) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val taken = df.columns.toSet
    val saltC = fresh("_salt", taken)
    val r1 = fresh("_r1", taken)
    val r2 = fresh("_r2", taken)
    val ns = fresh("_ns", taken)
    val nT = fresh("_n", taken)
    val w1 = Window.partitionBy(group :+ col(saltC): _*).orderBy(order: _*)
    val w1c = Window.partitionBy(group :+ col(saltC): _*)
    val w2 = Window.partitionBy(group: _*).orderBy(order: _*)
    val w2c = Window.partitionBy(group: _*)
    val out = df.withColumn(saltC, pmod(saltOn, lit(fanout)))
      .withColumn(ns, count(lit(1)).over(w1c))
      .withColumn(r1, row_number().over(w1))
      .filter(col(r1) <= k)
      .withColumn(nT, sum(when(col(r1) === 1, col(ns))).over(w2c))
      .withColumn(r2, row_number().over(w2))
      .filter(col(r2) <= k)
      .drop(saltC, r1, ns)
    (out, r2, nT)
  }
}

/** Bounded top-k aggregator: keeps the k highest-scoring elements
  * (score desc, id asc tie-break).
  *
  * This is the 100 TB shape for "top-k per group": partial
  * aggregation builds a size-k buffer per map task, the shuffle
  * carries only k rows per (group, partition) instead of the whole
  * group, and merges are O(k). A ranking window over the full group
  * would shuffle every candidate row.
  */
case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: List[Scored] = Nil

  // Amortized pruning: appends are O(1) and the buffer is sorted +
  // truncated only when it doubles past k, so n inserts cost
  // O(n log k) total instead of O(n·k log k) (a per-insert re-sort
  // measurably dominated the PQ rerank at k=100). The buffer bound
  // stays O(k).
  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    prune(a :: buf)

  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    prune(b1 ::: b2)

  private def prune(buf: List[Scored]): List[Scored] =
    if (buf.lengthCompare(2 * k) <= 0) buf else buf.sorted(ord).take(k)

  override def finish(r: List[Scored]): Seq[Scored] =
    r.sorted(ord).take(k)

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}