package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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

  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    insert(buf, a)

  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    b2.foldLeft(b1)(insert)

  private def insert(buf: List[Scored], a: Scored): List[Scored] = {
    val merged = (a :: buf).sorted(ord)
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(r: List[Scored]): Seq[Scored] = r.sorted(ord)

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

/** Bounded k-smallest aggregator over longs — same O(k)-buffer
  * partial-aggregation shape as [[TopKAggregator]]. Used to pick a
  * bucket's `k` lowest ids as its representatives
  * ([[graft.dedup.Dedup]]'s LSH bucket cap) without ever
  * materializing the full bucket membership in one place. */
class BoundedMinK(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], a: Long): List[Long] = insert(buf, a)

  override def merge(b1: List[Long], b2: List[Long]): List[Long] =
    b2.foldLeft(b1)(insert)

  private def insert(buf: List[Long], a: Long): List[Long] = {
    val merged = (a :: buf).sorted
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(r: List[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
